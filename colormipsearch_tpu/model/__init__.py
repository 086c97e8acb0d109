from .filedata import FileData, FileDataType
from .enums import (ComputeFileType, FileType, PPPScreenshotType,
                    ProcessingType, Gender)
from .entities import (NeuronEntity, EMNeuronEntity, LMNeuronEntity,
                       CDMatchEntity, PPPMatchEntity, CDSSessionEntity,
                       entity_from_dict)
