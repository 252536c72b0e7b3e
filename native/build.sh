#!/bin/sh
# Build the native components into .so libraries next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libobj_fast.so obj_fast.cpp
g++ -O2 -shared -fPIC -std=c++17 -o libreplay_store.so replay_store.cpp
echo "built: libobj_fast.so libreplay_store.so"
