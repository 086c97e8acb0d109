from .base import (DataSourceParam, ScoresFilter, SortCriteria,
                   CDMIPsReader, CDMIPsWriter, NeuronMatchesReader,
                   NeuronMatchesWriter)
from .fs import (JSONCDMIPsReader, JSONCDMIPsWriter,
                 JSONNeuronMatchesReader, JSONNeuronMatchesWriter,
                 JSONCDSSessionWriter)
