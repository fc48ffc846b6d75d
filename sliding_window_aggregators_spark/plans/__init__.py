"""Query plan registry: every implemented operator exposed as a
``(spark, sf_dir) → DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle — the contract consumed by ``__spark_entry__.py``."""

from __future__ import annotations

from . import events_queries


def all_queries():
    q = {}
    q.update(events_queries.QUERIES)
    try:
        from . import text_queries

        q.update(text_queries.QUERIES)
    except ImportError:
        pass
    try:
        from . import similarity_queries

        q.update(similarity_queries.QUERIES)
    except ImportError:
        pass
    try:
        from . import multimodal_queries

        q.update(multimodal_queries.QUERIES)
    except ImportError:
        pass
    try:
        from . import pipeline_queries

        q.update(pipeline_queries.QUERIES)
    except ImportError:
        pass
    try:
        from . import tpch_queries

        q.update(tpch_queries.QUERIES)
    except ImportError:
        pass
    return q


def all_oracles():
    o = {}
    o.update(events_queries.ORACLES)
    try:
        from . import text_queries

        o.update(text_queries.ORACLES)
    except ImportError:
        pass
    try:
        from . import similarity_queries

        o.update(similarity_queries.ORACLES)
    except ImportError:
        pass
    try:
        from . import multimodal_queries

        o.update(multimodal_queries.ORACLES)
    except ImportError:
        pass
    try:
        from . import pipeline_queries

        o.update(pipeline_queries.ORACLES)
    except ImportError:
        pass
    try:
        from . import tpch_queries

        o.update(tpch_queries.ORACLES)
    except ImportError:
        pass
    return o
