#!/bin/sh
# Build the native audio runtime into the python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    pat_audio.cc -o ../pyannote_audio_tpu/native/libpat_audio.so
echo "built pyannote_audio_tpu/native/libpat_audio.so"
