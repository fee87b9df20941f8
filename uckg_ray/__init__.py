"""uckg_ray — Ray-Data-native knowledge-graph construction engine.

Rebuilds the capabilities of the reference edogdu/UCKG pipeline
(collect → parse → RML-template triple extraction → ontology merge →
Neo4j materialize; see SURVEY.md) as a streaming ``ray.data.Dataset``
pipeline over Parquet transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``:

- ``stages.extract``      — batched mention detection + ontology-template
                            triple emission (reference: the RML layer,
                            ``mapping/*/*_rml.ttl`` + ``cve_collection.py:380-446``)
- ``stages.link``         — dictionary lookup joins with found/miss stub
                            semantics (reference: ``cve_collection.py:399-420``)
                            and alias-based entity linking (graft addition)
- ``stages.canonicalize`` — distributed min-label union-find over groupby
                            shuffles (reference: Neo4j unique-URI identity,
                            ``process/graph_updater.py:30-46``)
- ``stages.materialize``  — exact (subj,pred,obj) dedup + global sort +
                            node aggregation (reference: rdflib set-union +
                            n10s multival arrays, ``neo4j/import/init.cypher``)
- ``stages.dedup/text/similarity/windows`` — training-data-pipeline
                            operators (exact/minhash/simhash/jaccard dedup,
                            quality scoring, language id, ANN cosine top-k,
                            tumbling windows) beyond the reference.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the test fixture, ``bench.py`` and CLI entry points only.
"""

import os as _os

# One polars thread per process, set before any polars import (rayon
# sizes its pool at import time). Every hot polars call here runs inside
# a Ray task/actor declared num_cpus=1 — an unpinned pool spawns
# #cores threads PER worker (24 actors × 32 threads at bench scale) and
# the oversubscription costs 1.7× on the mention scan at 24 busy cores
# (measured). Ray already pins OMP_NUM_THREADS=1 for numpy/BLAS; this is
# the polars analogue. setdefault → a user can still override.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")


def _install_empty_schema_warning_filter() -> None:
    """Drop the one harmless variant of Ray Data's 'RefBundle with a
    different schema' executor warning: an EMPTY new schema, which the
    streaming executor emits for every empty partition a sort/groupby
    produces (20 groups through a 200-partition exchange → a wall of
    them). A real schema MISMATCH (two non-empty schemas) still warns —
    that one catches genuine operator bugs."""
    import logging

    class _EmptySchemaFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("RefBundle with a different schema" in msg
                        and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaFilter())


_install_empty_schema_warning_filter()

__version__ = "0.1.0"
