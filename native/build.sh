#!/bin/sh
# Build the native frameio library (libpng + libjpeg + pthreads).
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -o libframeio.so frameio/frameio.cpp \
    -lpng -ljpeg -lpthread
echo "built $(pwd)/libframeio.so"
