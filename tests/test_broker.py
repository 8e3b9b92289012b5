"""Live-broker smoke tests (`pytest -m broker`).

The sandboxed build environment has no Kafka broker and no
spark-sql-kafka jar, so these tests SKIP cleanly unless both are
present; the wire-format parity is covered broker-free in
test_files.py::test_kafka_wire_roundtrip_batch.  To run them for real:

    docker compose -f examples/kafka/docker-compose.yml up -d
    KSTREAM_SPARK_BROKER=localhost:9092 pytest -m broker tests/

(submit the session with the spark-sql-kafka connector jar on the
classpath — see the compose file's header for the --packages line).

r10 status: the sandbox now ships a docker CLIENT but still no daemon
(`docker info` -> cannot connect to /var/run/docker.sock) and no
network to pull images, so the compose recipe remains the deployment
story and this lane stays skip-clean here — re-attempt each round.
"""

import os
import socket
import uuid

import pytest

from kstream_spark.sources import kafka as K

BROKER = os.environ.get("KSTREAM_SPARK_BROKER", "")

pytestmark = pytest.mark.broker


def _broker_reachable() -> bool:
    if not BROKER or ":" not in BROKER:
        return False
    host, port = BROKER.rsplit(":", 1)
    try:
        with socket.create_connection((host, int(port)), timeout=2):
            return True
    except OSError:
        return False


def _require_live(spark):
    if not _broker_reachable():
        pytest.skip(f"no reachable broker (KSTREAM_SPARK_BROKER={BROKER!r})")
    if not K.available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")


def test_kafka_roundtrip_live(spark, tmp_path):
    """Produce through the sink builders, consume through the source
    builders, and assert the decoded payload round-trips — the live
    counterpart of the wire-format batch test."""
    _require_live(spark)
    topic = f"kstream_smoke_{uuid.uuid4().hex[:8]}"
    src = spark.createDataFrame(
        [(str(i), f"payload-{i}") for i in range(10)],
        "key string, value string")
    # batch write through the same option builders the stream sink uses
    (K.encode_records(src).write.format("kafka")
     .options(**K.sink_options(topic, BROKER)).save())
    got = (spark.read.format("kafka")
           .options(**K.source_options(topic, BROKER)).load())
    decoded = K.decode_records(got, value_schema=None)
    rows = {(r.key, r.value) for r in
            decoded.select("key", "value").collect()}
    assert rows == {(str(i), f"payload-{i}") for i in range(10)}


def test_kafka_streaming_sink_live(spark, tmp_path):
    """writeStream -> broker -> readStream: one micro-batch through the
    streaming builders with a checkpoint, verifying offsets commit."""
    _require_live(spark)
    topic = f"kstream_smoke_{uuid.uuid4().hex[:8]}"
    src_dir, ck = tmp_path / "in", tmp_path / "ck"
    spark.createDataFrame([(str(i), f"v{i}") for i in range(5)],
                          "key string, value string") \
        .coalesce(1).write.parquet(str(src_dir))
    stream = spark.readStream.schema("key string, value string") \
        .parquet(str(src_dir))
    q = K.write_stream(K.encode_records(stream), topic, BROKER, str(ck))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.read.format("kafka")
           .options(**K.source_options(topic, BROKER)).load())
    assert got.count() == 5
