"""Structured Streaming: the Kafka → cleanse → warehouse leg, plus
windowed/stateful extensions."""
