# Container image for eavit_tpu (reference Dockerfile:1-81 parity, TPU stack).
#
# For Cloud TPU VMs, prefer running directly on the host with the libtpu
# wheel; this image covers CPU development/CI and single-host TPU via the
# jax[tpu] extra.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    git make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY eavit_tpu ./eavit_tpu
COPY configs ./configs
COPY tests ./tests
COPY bench.py Makefile ./

# CPU by default; for TPU hosts install: pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -e '.[envs,test]' tensorboardX

ENV JAX_PLATFORMS=cpu
CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
