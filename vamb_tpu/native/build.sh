#!/bin/sh
# Build the native host-side ops libraries next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -Wall -Wextra -shared -fPIC vambops.cpp -o libvambops.so
g++ -O3 -march=native -Wall -Wextra -shared -fPIC bamcov.cpp -lz -o libbamcov.so
echo "built $(pwd)/libvambops.so and libbamcov.so"
