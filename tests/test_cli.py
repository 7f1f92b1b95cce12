"""spark-submit CLI surface (miekki/cli.py): the filter subcommand
writes verdicts + kept corpus consistently. The run/ingest paths are
covered by test_resume.py / test_pipeline.py through the same
pipeline.run they delegate to; here the subject is the CLI wiring
itself (arg parsing, catalog table names, summary JSON).
"""

import json

import pytest

from miekki.catalog import HadoopCatalog
from miekki.cli import main


@pytest.fixture(scope="module")
def filter_catalog_root(spark, corpus_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_catalog"))
    cat = HadoopCatalog(spark, root)
    cat.overwrite("corpus", corpus_df, run_id="ingest")
    return root


def test_cli_filter_consistent(spark, corpus_df, filter_catalog_root,
                               capsys):
    main(["filter", "--catalog-root", filter_catalog_root,
          "--run-id", "f1", "--langs", "en"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n_corpus = corpus_df.count()
    assert out["n_docs"] == n_corpus
    dropped = sum(out["dropped_by_reason"].values())
    assert out["n_kept"] + dropped == n_corpus
    # every reason string is a comma-join of known check names
    known = {"quality", "lang", "pii", "repetition"}
    for reasons in out["dropped_by_reason"]:
        assert reasons and set(reasons.split(",")) <= known

    cat = HadoopCatalog(spark, filter_catalog_root)
    v = cat.read("filter_verdicts")
    assert v.count() == n_corpus
    kept = cat.read("corpus_kept")
    assert kept.count() == out["n_kept"]
    # kept table preserves the corpus schema (no doc_id leftover)
    assert sorted(kept.columns) == sorted(corpus_df.columns)
