"""infidex_tpu — a TPU-native full-text fuzzy search engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of lofcz/Infidex with a
TPU-first architecture: HBM-resident CSR posting tensors scored by dense
batched XLA programs, char-n-gram fuzzy matching, a multi-algorithm coverage
cascade, lexicographic fusion ranking, an SQL-like filter DSL compiled to
both a stack VM and vectorized columnar predicates, facets, boosts,
synonyms, persistence and multi-chip sharding.
"""

from .utils.jaxcache import enable_persistent_cache as _enable_xla_cache

_enable_xla_cache()

from .api.fields import DocumentFields, Field, Weight
from .api.filters import (CompositeFilter, DerivedFilter, Filter,
                          FilterBuilder, FilterParseException, InFilter,
                          LiteralFilter, NullFilter, RangeFilter, RegexFilter,
                          StringFilter, StringOperation, TernaryFilter,
                          ValueFilter)
from .api.query import Boost, BoostStrength, Query, Result
from .core.config import (AutoSegmentationSetup, ConfigurationParameters,
                          WordMatcherSetup, get_config, has_config)
from .core.documents import Document, DocumentCollection
from .coverage.setup import CoverageSetup
from .engine import IndexStatistics, SearchEngine, SearchEngineStatus
from .index.vector_model import ScoreEntry, VectorModel
from .api.process_monitor import ProcessMonitor
from .core.shingle import Shingle, SystemStatus
from .core.topk import TopKHeap
from .filtering.mask import FilterCache, FilterMask
from .index.trie import TrieIndex
from .synonyms import SynonymMap
from .utils.roaring import RoaringBitmap
from .tokenization.normalizer import TextNormalizer
from .tokenization.tokenizer import Tokenizer, TokenizerSetup

__version__ = "0.1.0"

__all__ = [
    "AutoSegmentationSetup",
    "Boost",
    "FilterCache",
    "FilterMask",
    "ProcessMonitor",
    "RoaringBitmap",
    "Shingle",
    "SystemStatus",
    "TopKHeap",
    "TrieIndex",
    "BoostStrength",
    "CompositeFilter",
    "ConfigurationParameters",
    "CoverageSetup",
    "DerivedFilter",
    "Document",
    "Filter",
    "FilterBuilder",
    "FilterParseException",
    "InFilter",
    "LiteralFilter",
    "NullFilter",
    "RangeFilter",
    "RegexFilter",
    "StringFilter",
    "StringOperation",
    "TernaryFilter",
    "ValueFilter",
    "DocumentCollection",
    "DocumentFields",
    "Field",
    "IndexStatistics",
    "Query",
    "Result",
    "ScoreEntry",
    "SearchEngine",
    "SearchEngineStatus",
    "SynonymMap",
    "TextNormalizer",
    "Tokenizer",
    "TokenizerSetup",
    "VectorModel",
    "Weight",
    "WordMatcherSetup",
    "get_config",
    "has_config",
]
