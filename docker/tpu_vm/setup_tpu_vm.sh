#!/usr/bin/env bash
# Bare-metal Cloud TPU VM setup (alternative to the Dockerfile).
# Usage: bash docker/tpu_vm/setup_tpu_vm.sh  (run ON the TPU VM)
set -euo pipefail

pip install --upgrade pip
pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -e .[test]
pip install transformers tqdm

# the native TFRecord reader self-compiles on first use (needs g++);
# nothing to do here beyond having a toolchain installed

# persistent XLA compilation cache across runs
mkdir -p ~/.jax_compilation_cache

python -c "import jax; print('devices:', jax.devices())"
