# clair3-tpu runtime image.
# The compute path targets TPU VMs (JAX + libtpu); this image covers the
# host-side runtime (C++ extractors build with g++ at first use).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

# On a TPU VM replace with: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax numpy h5py

WORKDIR /opt/clair3_tpu
COPY clair3_tpu/ clair3_tpu/
COPY README.md docs/ ./
ENV PYTHONPATH=/opt/clair3_tpu

ENTRYPOINT ["python", "-m", "clair3_tpu"]
CMD ["--help"]
