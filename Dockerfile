# Packaging twin of the reference's Dockerfile (reference Dockerfile:1-25),
# adapted for a Spark driver container: JRE 17 for the in-process JVM when
# running local-mode; on a real cluster this image is the driver/executor
# image and spark-submit points at the cluster master instead.
FROM python:3.11-slim

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends \
    openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY binance_etl_clickhouse_spark/ ./binance_etl_clickhouse_spark/
COPY pyproject.toml .
RUN pip install --no-cache-dir --no-deps .

RUN useradd -m -u 1000 appuser && chown -R appuser:appuser /app
USER appuser

# ≙ reference CMD ["python", "run_pipeline.py"]; --once for a single run
CMD ["binance-etl-spark", "--base-dir", "/data/spark_warehouse"]
