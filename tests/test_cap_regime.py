"""Pure-Python pins for scripts/exp_cap_regime.py's corpus cache
(ADVICE r12): the cache marker must invalidate when the SOURCE data
is regenerated in place (mtime), not just when SRC's path or the copy
scheme changes — a silently reused stale corpus corrupts the
published byte exponents. No Spark needed."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def test_corpus_stamp_tracks_source_mtime(tmp_path):
    import exp_cap_regime as cr

    doc = tmp_path / "documents.parquet"
    doc.write_bytes(b"x")
    os.utime(doc, (1000, 1000))
    s1 = cr._corpus_stamp(str(tmp_path))
    assert str(tmp_path) in s1 and ":1000" in s1
    # regenerating the source in place must change the stamp
    os.utime(doc, (2000, 2000))
    assert cr._corpus_stamp(str(tmp_path)) != s1
    # a different source dir never matches either
    other = tmp_path / "other"
    other.mkdir()
    (other / "documents.parquet").write_bytes(b"y")
    os.utime(other / "documents.parquet", (1000, 1000))
    assert cr._corpus_stamp(str(other)) != s1


def test_corpus_stamp_tracks_table_listing(tmp_path):
    """Code review r13: a table ADDED to SRC after the corpus was
    cached has no symlink in the cached corpus — the stamp must
    include the table listing so the cache invalidates."""
    import exp_cap_regime as cr

    doc = tmp_path / "documents.parquet"
    doc.write_bytes(b"x")
    os.utime(doc, (1000, 1000))
    s1 = cr._corpus_stamp(str(tmp_path))
    (tmp_path / "clicks.parquet").write_bytes(b"z")
    s2 = cr._corpus_stamp(str(tmp_path))
    assert s2 != s1 and "clicks.parquet" in s2
    # non-parquet entries (e.g. a .done marker) must NOT perturb it
    (tmp_path / ".done").write_text("m")
    assert cr._corpus_stamp(str(tmp_path)) == s2


def test_shared_token_rejects_embedding_probes_before_build(
    monkeypatch, capsys
):
    """The production-sizing probes read embeddings.parquet, which the
    shared-token scheme symlinks UNCHANGED — a flat x1 exponent would
    be meaningless, so main() must reject them up front (exit 2)
    without building a session or corpus."""
    import exp_cap_regime as cr

    monkeypatch.setattr(
        sys, "argv",
        ["exp_cap_regime.py", "--queries", "semantic_prune_prod", "3"],
    )
    assert cr.main() == 2
    assert "does not scale" in capsys.readouterr().err


def test_shared_token_rejects_registry_embedding_queries(
    monkeypatch, capsys
):
    """Code review r13: a REGISTRY query that reads embeddings (e.g.
    sim_cosine_topk) has the identical flat-exponent hazard as the
    exp_scaling probes — the guard keys on what the query reads (its
    oracle references the embeddings view), not registry membership."""
    import exp_cap_regime as cr

    monkeypatch.setattr(
        sys, "argv",
        ["exp_cap_regime.py", "--queries", "sim_cosine_topk", "3"],
    )
    assert cr.main() == 2
    assert "does not scale" in capsys.readouterr().err


def test_shared_token_warns_on_non_document_queries(monkeypatch, capsys):
    """A registry query reading only x1-symlinked tables runs (that is
    the ADVICE r12 crash fix) but must warn that its exponent is not a
    scaling claim. The session builder is stubbed to a sentinel so the
    test stays Spark-free: the warning must land BEFORE it."""
    import pytest

    import exp_cap_regime as cr

    def _boom(name):
        raise RuntimeError("sentinel: session build reached")

    monkeypatch.setattr(cr, "_ui_session", _boom)
    monkeypatch.setattr(
        sys, "argv",
        ["exp_cap_regime.py", "--queries", "tpch_q1_pricing_summary", "3"],
    )
    with pytest.raises(RuntimeError, match="sentinel"):
        cr.main()
    assert "not a scaling claim" in capsys.readouterr().err
