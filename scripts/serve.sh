#!/bin/bash
# Start the RAG API server
# (capability parity with reference 3-fastapi-uvicorn-server.sh)
set -e
echo "Starting RAG API Server..."
echo "Endpoints:"
echo "  - POST /search: Search and generate responses"
echo "  - GET  /health: Health check"
echo "  - GET  /stats:  Serving latency stats"
python -m rag_faiss_embedding_tpu.serve.api "$@"
