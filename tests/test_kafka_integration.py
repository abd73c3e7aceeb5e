"""Kafka integration — docker-gated produce -> readStream -> sink
round-trip.

Two preconditions, each probed and reported separately when absent:

1. a REACHABLE docker daemon (to launch a single-node KRaft broker);
2. the spark-sql-kafka-0-10 package on the session classpath
   (``streaming.pipeline.kafka_available`` — the same probe the
   source/sink builders gate on).

Neither ships in this container (the docker CLI is present but the
daemon socket is not served, and the kafka010 provider class is absent
— no network to fetch either), so in the sandbox this module self-skips
with the precise reason; on infra that has both it runs the full
round-trip: batch-write rows through the kafka sink format, stream them
back via ``kafka_source``, and value-compare in a memory sink.  The
builders' classpath gating itself is covered unconditionally by
tests/test_streaming.py::test_kafka_plumbing_gated.
"""

from __future__ import annotations

import json
import socket
import subprocess
import time
import uuid

import pytest

BROKER_IMAGE = "apache/kafka:3.8.0"  # KRaft single-node, no zookeeper
BROKER_PORT = 19092


def _docker_daemon_up() -> bool:
    try:
        return (
            subprocess.run(
                ["docker", "info"],
                capture_output=True,
                timeout=10,
            ).returncode
            == 0
        )
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _wait_port(host: str, port: int, timeout_s: float = 60.0) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with socket.create_connection((host, port), timeout=2):
                return True
        except OSError:
            time.sleep(1)
    return False


@pytest.fixture(scope="module")
def kafka_broker():
    """Single-node KRaft broker in docker, torn down after the module."""
    if not _docker_daemon_up():
        pytest.skip("docker daemon unreachable (no /var/run/docker.sock)")
    name = f"dfspark-kafka-{uuid.uuid4().hex[:8]}"
    run = subprocess.run(
        [
            "docker",
            "run",
            "-d",
            "--rm",
            "--name",
            name,
            "-p",
            f"{BROKER_PORT}:9092",
            BROKER_IMAGE,
        ],
        capture_output=True,
        text=True,
    )
    if run.returncode != 0:
        pytest.skip(f"could not launch broker image: {run.stderr[:200]}")
    try:
        if not _wait_port("localhost", BROKER_PORT):
            pytest.skip("broker did not open its port within 60s")
        yield f"localhost:{BROKER_PORT}"
    finally:
        subprocess.run(
            ["docker", "rm", "-f", name], capture_output=True
        )


def test_kafka_roundtrip(spark, kafka_broker, tmp_path):
    """produce (batch kafka sink) -> readStream -> memory sink must
    return exactly the produced payloads."""
    from dataforge_core_spark.streaming.pipeline import (
        kafka_available,
        kafka_source,
    )

    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka-0-10 package not on the classpath")

    topic = f"dfspark_rt_{uuid.uuid4().hex[:8]}"
    payloads = [{"event_id": i, "value": i * 10} for i in range(20)]
    df = spark.createDataFrame(
        [(str(p["event_id"]), json.dumps(p)) for p in payloads],
        "key string, value string",
    )
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_broker)
        .option("topic", topic)
        .save()
    )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.LongType()),
        ]
    )
    stream = kafka_source(
        spark, kafka_broker, topic, schema=schema,
        starting_offsets="earliest",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_rt")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.value)
        for r in spark.sql(
            "SELECT event_id, value FROM kafka_rt"
        ).collect()
    )
    assert got == sorted((p["event_id"], p["value"]) for p in payloads)
