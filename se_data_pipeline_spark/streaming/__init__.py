"""Structured Streaming surface (SURVEY §2.11, M7): the reference's
hand-rolled incremental behaviors (ledger dedup T1, periodic
checkpoint flush T2, retry T3, dead-letter T4) as native streaming
operators with watermarks and exactly-once sinks."""
