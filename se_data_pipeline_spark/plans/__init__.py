"""Pipeline entry points mirroring the reference's three lifecycles
(SURVEY §3): channel_ranking (E3.2 analytics), ingest (E1 full
ingest), probe (E2 quality probe). fixtures.py synthesizes the
domain tables (FIXTURES.md §A) deterministically for tests."""
