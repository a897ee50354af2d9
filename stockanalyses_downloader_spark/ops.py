"""Operational plane (reference K3/K4: service registration + heartbeat
thread, main.py:156-183,233-261, and the rotating log sink,
main.py:98-105).

Spark already owns process liveness (driver/executor heartbeats) and
logging (log4j); this module provides the *data-shaped* parity surface:

  instance_info       the registration payload the reference POSTs
                      ({hostname, ipaddr, instance_id, state}) as a row
  HeartbeatListener   StreamingQueryListener emitting one heartbeat
                      record per micro-batch progress event — the
                      streaming-native replacement for the reference's
                      30 s PUT loop
  metrics_frame       collected heartbeats as a DataFrame for the same
                      downstream consumers the reference's service API
                      fed
"""

from __future__ import annotations

import socket
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass(frozen=True)
class InstanceInfo:
    hostname: str = field(default_factory=socket.gethostname)
    ipaddr: str = "127.0.0.1"
    instance_id: str = field(default_factory=lambda: str(uuid.uuid4()))
    state: str = "running"


def instance_info() -> InstanceInfo:
    info = InstanceInfo()
    try:
        addr = socket.gethostbyname(info.hostname)
    except OSError:
        addr = "127.0.0.1"
    return InstanceInfo(hostname=info.hostname, ipaddr=addr,
                        instance_id=info.instance_id, state=info.state)


class HeartbeatListener(StreamingQueryListener):
    """Collects per-progress heartbeat records in memory (bounded)."""

    def __init__(self, max_records: int = 10_000):
        self.records: list[dict] = []
        self._max = max_records
        self.instance = instance_info()

    def onQueryStarted(self, event) -> None:
        self._push({"event": "started", "query_id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._push({"event": "heartbeat", "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "timestamp": p.timestamp})

    def onQueryTerminated(self, event) -> None:
        self._push({"event": "terminated", "query_id": str(event.id)})

    def onQueryIdle(self, event) -> None:
        self._push({"event": "idle", "query_id": str(event.id)})

    def _push(self, rec: dict) -> None:
        rec = {**asdict(self.instance), **rec}
        self.records.append(rec)
        if len(self.records) > self._max:
            del self.records[: len(self.records) - self._max]

    def metrics_frame(self, spark: SparkSession) -> DataFrame:
        rows = [{**{"batch_id": None, "num_input_rows": None,
                    "timestamp": None}, **r} for r in self.records]
        return spark.createDataFrame(rows, _METRICS_SCHEMA) if rows else \
            spark.createDataFrame([], _METRICS_SCHEMA)


_METRICS_SCHEMA = ("hostname string, ipaddr string, instance_id string, "
                   "state string, event string, query_id string, "
                   "batch_id long, num_input_rows long, timestamp string")


class MetricsParquetListener(HeartbeatListener):
    """K3 durable upgrade: every lifecycle/heartbeat record also
    appends to a parquet metrics table — the ops-plane equivalent of
    the reference's service-API PUT loop, but a queryable table
    instead of a fire-and-forget HTTP call. One tiny file per event
    is fine at heartbeat cadence; partition by date and compact if a
    fleet of queries shares the table."""

    def __init__(self, spark: SparkSession, path: str,
                 max_records: int = 10_000):
        super().__init__(max_records)
        self._spark = spark
        self._path = path

    def _push(self, rec: dict) -> None:
        super()._push(rec)
        row = {**{"batch_id": None, "num_input_rows": None,
                  "timestamp": None}, **self.records[-1]}
        (self._spark.createDataFrame([row], _METRICS_SCHEMA)
         .write.mode("append").parquet(self._path))
