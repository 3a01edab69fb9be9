from .flat import FlatIndex
from .pq import PQIndex
from .vector_store import VectorStore
