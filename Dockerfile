# Container recipe for the TPU color-depth-search toolset.
#
# Counterpart of the reference's two-stage Dockerfile (Dockerfile:1-28:
# jdk builder stage producing the jar-with-dependencies, runtime stage
# carrying only the artifact). Here the builder stage wheels the
# package; the runtime stage installs the wheel plus the TPU jax
# runtime and exposes the same CLI surface.
#
# Build:  docker build -t colormipsearch-tpu .
# Run:    docker run colormipsearch-tpu colorDepthSearch --help
# On TPU VMs pass the libtpu runtime through (e.g. a jax[tpu] base or
# --device bind mounts per the TPU VM docs).

FROM python:3.11-slim AS builder
WORKDIR /src
COPY pyproject.toml README.md ./
COPY colormipsearch_tpu ./colormipsearch_tpu
RUN pip install --no-cache-dir build \
 && python -m build --wheel --outdir /dist

FROM python:3.11-slim
# g++/OpenMP for the lazily-built native mipops helper (optional:
# NumPy fallbacks cover hosts without it)
RUN apt-get update -y \
 && apt-get install -y --no-install-recommends g++ libgomp1 \
 && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY --from=builder /dist/*.whl /tmp/
RUN pip install --no-cache-dir /tmp/*.whl && rm /tmp/*.whl
ENTRYPOINT ["colormipsearch-tpu"]
CMD ["--help"]
