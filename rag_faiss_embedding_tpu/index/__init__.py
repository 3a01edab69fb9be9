from .faiss_import import import_faiss_index
from .flat import FlatIndex
from .pq import PQIndex
from .vector_store import VectorStore
