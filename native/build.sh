#!/bin/sh
# Build the native audio runtime into the python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    pat_audio.cc -o ../pyannote_audio_tpu/native/libpat_audio.so
echo "built pyannote_audio_tpu/native/libpat_audio.so"

# any-format decoder (FLAC/MP3/OGG/...) via FFmpeg libraries; optional —
# failure here must not break the WAV fast path
if g++ -O3 -shared -fPIC -std=c++17 \
    pat_codec.cc -o ../pyannote_audio_tpu/native/libpat_codec.so \
    -lavformat -lavcodec -lavutil -lswresample; then
  echo "built pyannote_audio_tpu/native/libpat_codec.so"
else
  echo "WARNING: libpat_codec.so not built (FFmpeg libs missing?)" >&2
fi
