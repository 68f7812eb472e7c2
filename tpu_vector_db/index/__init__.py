"""ANN index layer.

The reference wrapped hnswlib, a C++ pointer-chasing HNSW
(performance/hnsw_index.py — the repo's only native component, SURVEY.md
§2.B). Pointer chasing does not map to a TPU, so the index here is a
different algorithm with the same contract (M / ef_construction / ef_search
knobs, recall/latency trade-off): a flat navigable graph searched by BATCHED
BEAM SEARCH — dense gather-based neighbor expansion, candidate-pool
dedup instead of a visited set, all shapes static — and built by batched
insertion with on-device alpha-pruning (Vamana-style diversity), fixing the
reference's rebuild-on-every-add flaw with true incremental adds.
"""

from tpu_vector_db.index.beam_graph import BeamGraphIndex  # noqa: F401
