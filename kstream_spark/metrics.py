"""Metrics reporter parity (ref: the tryfix metrics interface threaded
through the engine — kstream/builder_config.go:69,113 `MetricsReporter`,
processor latency observers kstream/processor.go:40-75, consumer
end-to-end/commit latency consumer/consumer.go:190-199, store backend
read/update latency backend/memory/memory.go:79-83).

Spark already measures everything the reference hand-instruments (task
metrics, SQL metrics, streaming progress); this module gives that data the
reference's Reporter SHAPE so applications that exported counters keep
their integration, and wires a StreamingQueryListener so streaming
queries feed the reporter automatically.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field


@dataclass(frozen=True)
class MetricConf:
    """Ref: metrics.MetricConf{Path, Labels}."""
    path: str
    labels: tuple = ()


class Counter:
    def __init__(self, store, conf: MetricConf):
        self._store, self._conf = store, conf

    def count(self, value: float = 1, labels: dict | None = None) -> None:
        key = (self._conf.path, tuple(sorted((labels or {}).items())))
        self._store[key] += value


class Observer:
    def __init__(self, store, conf: MetricConf):
        self._store, self._conf = store, conf

    def observe(self, value: float, labels: dict | None = None) -> None:
        key = (self._conf.path, tuple(sorted((labels or {}).items())))
        self._store[key].append(value)


class Reporter:
    """Ref: metrics.Reporter — Counter(conf) / Observer(conf) factories."""

    def counter(self, conf: MetricConf) -> Counter:
        raise NotImplementedError

    def observer(self, conf: MetricConf) -> Observer:
        raise NotImplementedError


class NoopReporter(Reporter):
    """Ref default: metrics.NoopReporter() (builder_config.go:113)."""

    def counter(self, conf: MetricConf) -> Counter:
        return Counter(defaultdict(float), conf)

    def observer(self, conf: MetricConf) -> Observer:
        return Observer(defaultdict(list), conf)


class InMemoryReporter(Reporter):
    """Collecting reporter: counters sum, observers keep series — the test
    and single-process substitute for a Prometheus push."""

    def __init__(self):
        self.counters: dict = defaultdict(float)
        self.observations: dict = defaultdict(list)

    def counter(self, conf: MetricConf) -> Counter:
        return Counter(self.counters, conf)

    def observer(self, conf: MetricConf) -> Observer:
        return Observer(self.observations, conf)

    def series(self, path: str) -> list:
        """All recorded values for a metric path, across label sets
        (counter totals and flattened observation series)."""
        out = [v for (p, _l), v in self.counters.items() if p == path]
        for (p, _l), vs in self.observations.items():
            if p == path:
                out.extend(vs)
        return out


def attach_streaming_metrics(spark, reporter: Reporter):
    """Feed streaming progress into the reporter — the Spark-native source
    of the reference's hand-instrumented numbers:
      * stream_processed_count        <- progress.sink numOutputRows
                                         (ref: processor throughput)
      * stream_batch_latency_ms       <- progress batchDuration
                                         (ref: processed_latency_microseconds)
      * stream_input_rows_per_second  <- progress inputRowsPerSecond
                                         (ref: consumer end-to-end rate)
    Returns the listener (pass to spark.streams.removeListener to detach).
    """
    import json

    from pyspark.sql.streaming import StreamingQueryListener

    out_rows = reporter.counter(MetricConf("stream_processed_count"))
    latency = reporter.observer(MetricConf("stream_batch_latency_ms"))
    rate = reporter.observer(MetricConf("stream_input_rows_per_second"))

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            labels = {"query": p.get("name") or p.get("id", "")}
            sink_rows = (p.get("sink") or {}).get("numOutputRows", 0)
            if sink_rows and sink_rows > 0:
                out_rows.count(sink_rows, labels)
            dur = (p.get("durationMs") or {}).get("triggerExecution")
            if dur is not None:
                latency.observe(dur, labels)
            ips = p.get("inputRowsPerSecond")
            if ips is not None:
                rate.observe(ips, labels)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener
