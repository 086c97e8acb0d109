from .config import Config
from .idgenerator import TimebasedIdGenerator
