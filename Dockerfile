# Benchmark harness image (role parity with the reference's Dockerfile:
# hermetic environment for running the experiment grids). The TPU runtime
# comes from the host (libtpu via device plugin); this image covers CPU
# development and the dataset pipeline.
FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make wget ca-certificates && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml setup.py README.md ./
COPY flatnav_tpu ./flatnav_tpu
COPY tools ./tools
COPY benchmarks ./benchmarks
COPY bin ./bin
COPY tests ./tests

RUN pip install --no-cache-dir "jax[cpu]" numpy pytest matplotlib h5py \
    && pip install --no-cache-dir -e . \
    && bash flatnav_tpu/native/build_native.sh

# default: run the benchmark grid target passed as argument
ENTRYPOINT ["make", "-C", "benchmarks"]
CMD ["sift"]
