"""Topic admin surface.

Ref: admin/kafka_admin.go:33-39 (interface: FetchInfo/CreateTopics/
DeleteTopics), kafka_admin.go:91-177 (sarama implementation),
kstream/topic_builder.go:9-33 (ensure-topic helper), and the changelog topic
auto-creation with ``cleanup.policy=compact`` (kstream/builder.go:382-434,
compact policy at line 426).

In the Spark engine changelog topics are replaced by checkpoint directories,
so topic admin is out-of-engine setup.  The interface is kept for API parity;
``InMemoryTopicAdmin`` mirrors the reference's mock (admin/mock_kafka_admin.go,
admin/mock_topics.go) and backs tests; a live implementation would wrap
kafka-python/confluent-kafka (not installed in this container — gated import).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Topic:
    name: str
    num_partitions: int = 1
    replication_factor: int = 1
    config: dict = field(default_factory=dict)


class TopicAdmin:
    """Ref interface: admin/kafka_admin.go:33-39."""

    def fetch_info(self, topics: list[str]) -> dict[str, Topic]:
        raise NotImplementedError

    def create_topics(self, topics: dict[str, Topic]) -> None:
        raise NotImplementedError

    def delete_topics(self, topics: list[str]) -> None:
        raise NotImplementedError


class InMemoryTopicAdmin(TopicAdmin):
    """Mirror of the reference's mock admin (admin/mock_kafka_admin.go)."""

    def __init__(self):
        self._topics: dict[str, Topic] = {}

    def fetch_info(self, topics):
        return {t: self._topics[t] for t in topics if t in self._topics}

    def create_topics(self, topics):
        for name, t in topics.items():
            if name not in self._topics:
                self._topics[name] = t

    def delete_topics(self, topics):
        for t in topics:
            self._topics.pop(t, None)

    def ensure_changelog_topic(self, for_topic: str, suffix: str = "_changelog",
                               num_partitions: int = 1) -> Topic:
        """Ref: builder.go:382-434 — changelog topics are created compacted
        (cleanup.policy=compact, line 426)."""
        name = f"{for_topic}{suffix}"
        t = Topic(name, num_partitions=num_partitions,
                  config={"cleanup.policy": "compact"})
        self.create_topics({name: t})
        return t


def live_admin(bootstrap_servers: str) -> TopicAdmin:
    """Live Kafka admin — requires kafka-python/confluent-kafka (absent in
    this container; install gate mirrors the Delta/Kafka jar gating)."""
    try:
        import kafka  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "no kafka client library installed; use InMemoryTopicAdmin or "
            "install kafka-python") from e
    raise NotImplementedError("live Kafka admin wiring is environment-specific")
