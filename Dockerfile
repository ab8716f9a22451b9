# Container image for the edlib_tpu aligner CLI + Python library.
#
# Counterpart of the reference's Dockerfile (which builds its CLI binary
# into a minimal image).  This image carries both entry points:
#   docker run <img> edlib-tpu-aligner -m HW queries.fa target.fa   # native CLI
#   docker run <img> python -m edlib_tpu.cli ...                    # device-capable CLI
# Mount TPU device nodes / set the usual TPU runtime env to let the
# Python CLI reach an accelerator; everything degrades to the native
# host engines without one.

FROM python:3.12-slim AS build

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY . .
# Wheel with prebuilt native objects (setup.py build hook), plus the
# standalone native CLI binary.
RUN pip wheel . --no-deps -w /wheels \
    && make -C native aligner \
    && cp native/edlib-tpu-aligner /usr/local/bin/

FROM python:3.12-slim

# libstdc++ ships with the slim image; only the wheel and CLI binary move.
COPY --from=build /wheels /wheels
COPY --from=build /usr/local/bin/edlib-tpu-aligner /usr/local/bin/
RUN pip install --no-cache-dir /wheels/*.whl jax numpy \
    && rm -rf /wheels

CMD ["edlib-tpu-aligner"]
