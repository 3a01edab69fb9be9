#!/bin/bash
# (capability parity with reference health.sh)
curl "http://localhost:${1:-8000}/health"
