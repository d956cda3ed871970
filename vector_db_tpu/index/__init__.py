"""Index implementations — one class per reference index type (SURVEY.md §2)."""

from .annoy import AnnoyIndex
from .base import VectorIndex
from .brute import BruteForceIndex
from .hnsw import HnswIndex
from .hnsw_pq import HnswPqIndex
from .ivf import IvfIndex
from .lsh import LshIndex
from .pq import PqIndex

__all__ = [
    "VectorIndex",
    "BruteForceIndex",
    "HnswIndex",
    "HnswPqIndex",
    "PqIndex",
    "IvfIndex",
    "LshIndex",
    "AnnoyIndex",
]
