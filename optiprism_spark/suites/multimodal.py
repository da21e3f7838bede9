"""Multimodal plumbing suite (rows-only: the fake decoder is
deterministic but not SQL-expressible; semantics pinned by
tests/test_pipeline_ops.py)."""

from __future__ import annotations

from ..operators.multimodal import extract_features, media_from_documents
from ..registry import query
from ..schema import load_table


@query("multimodal_features")
def multimodal_features(spark, sf_dir):
    """binary-payload media table → mapInPandas feature extraction
    (stubbed decode, real batch plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(media_from_documents(docs), dim=8)
