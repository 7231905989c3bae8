# isbfsar-tpu compute container — the reference's deployment topology
# (reference Dockerfile:1-57, README.md:20-44): ALL compute runs in the
# container, host I/O (camera + GUI) stays on the host, the two sides meet
# at the TCP queue hub on port 50000.
#
# Where the reference image carries CUDA + TensorRT + conda, the TPU
# rebuild needs only a JAX TPU wheel: the four .engine files collapse into
# jit programs compiled on first run and persisted in the compile-cache
# volume, so warm restarts skip recompilation.
#
# Build:
#   docker build -t isbfsar-tpu .
#
# Run (three processes, reference README.md:33-44):
#   docker run --rm --net=host --privileged \
#       -v /var/cache/isbfsar-jax:/cache isbfsar-tpu isbfsar-hub &
#   docker run --rm --net=host --privileged \
#       -v /var/cache/isbfsar-jax:/cache isbfsar-tpu isbfsar-serve &
#   python -m isbfsar_tpu.runtime.source_cli --gui        # on the host
#
# --privileged exposes the TPU devices (/dev/accel*) on Cloud TPU VMs;
# --net=host lets the host source reach the hub without port mapping
# (equivalently: -p 50000:50000 and point the host at the container).
#
# Same-host fast path (no hub container): share the host's /dev/shm and
# run serve with the native shared-memory transport —
#   docker run --rm --net=host --privileged --ipc=host \
#       -v /var/cache/isbfsar-jax:/cache isbfsar-tpu \
#       python -m isbfsar_tpu.runtime.serve --hub shm --fused &
#   python -m isbfsar_tpu.runtime.source_cli --hub shm --gui   # on the host
# (--ipc=host is required: the C++ ring lives in POSIX shared memory;
# 30.2 FPS median vs 29.0 over the TCP hub, docs/PERF.md.)

FROM python:3.12-slim

# native toolchain: the shm-queue transport compiles its C++ ring on first
# use; libgl/libglib are opencv-headless runtime deps
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

# TPU-enabled JAX (pulls libtpu via the google extra) + the runtime deps.
# CPU-only deployments (hub, development) work with the same image: JAX
# falls back to the CPU backend when no TPU is present.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax einops numpy opencv-python-headless matplotlib

WORKDIR /app
COPY pyproject.toml /app/
COPY isbfsar_tpu /app/isbfsar_tpu
COPY tools /app/tools
RUN pip install --no-cache-dir --no-deps -e .

# persistent XLA compile cache (mount a volume here — first compile of the
# fused pipeline takes minutes, warm starts seconds)
ENV JAX_COMPILATION_CACHE_DIR=/cache
VOLUME /cache

ENV PYTHONUNBUFFERED=1
# the reference gates docker-specific paths on this (utils/params.py:7);
# kept for operator parity although this rebuild needs no path switching
ENV AM_I_IN_A_DOCKER_CONTAINER=Yes

EXPOSE 50000
CMD ["isbfsar-serve"]
