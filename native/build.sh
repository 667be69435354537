#!/bin/sh
# Build the native data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libcurvdata.so decoder.cpp
echo "built native/libcurvdata.so"
