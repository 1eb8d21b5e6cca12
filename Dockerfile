# Deployment image for sypha_tpu (counterpart of the reference's
# nvidia/cuda devel image + compose file).  TPU access comes from the
# runtime (GKE TPU node pools / libtpu), not the image.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

RUN pip install --no-cache-dir "jax[tpu]" numpy scipy && make

ENTRYPOINT ["python", "-m", "sypha_tpu"]
CMD ["--model", "SCP", "--input-file", "data/demo_small.txt", "--verbosity", "3"]
