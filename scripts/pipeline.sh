#!/bin/bash
# Ingest HTML corpus and build the vector index
# (capability parity with reference 1-rag-faiss-sqlite-pipeline.sh)
set -e
python -m rag_faiss_embedding_tpu.cli.pipeline --max-content-length 512 --max-sentences 2 "$@"
