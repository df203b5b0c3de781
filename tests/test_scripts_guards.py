"""Guards in the study driver scripts (scripts/*.py).

The studies persist their corpus next to their results; reusing a corpus
built for a different mask kind would silently mislabel the committed
study artifact, so informative_study refuses a dest whose corpus_meta
disagrees with the requested --freeform/timegap kind (and treats a
meta-less pre-existing corpus as the historical timegap default).
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_informative_study():
    spec = importlib.util.spec_from_file_location(
        "informative_study", os.path.join(REPO, "scripts", "informative_study.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_informative_study_rejects_mask_kind_mismatch(tmp_path):
    mod = _load_informative_study()
    dest = tmp_path / "corpus"
    (dest / "grouped").mkdir(parents=True)
    (dest / "corpus_meta.json").write_text(json.dumps({"mask_kind": "timegap"}))
    with pytest.raises(SystemExit, match="timegap.*freeform"):
        mod.main(dest=str(dest), mask_kind="freeform")


def test_informative_study_meta_less_corpus_defaults_to_timegap(tmp_path):
    # corpora built before the meta stamp existed are all timegap: a
    # --freeform run against one must refuse too
    mod = _load_informative_study()
    dest = tmp_path / "corpus"
    (dest / "grouped").mkdir(parents=True)
    with pytest.raises(SystemExit, match="timegap.*freeform"):
        mod.main(dest=str(dest), mask_kind="freeform")


def test_informative_study_rejects_incomplete_corpus(tmp_path):
    # the stamp is written with complete=False BEFORE the build starts; a
    # crash mid-build leaves it that way and a later run must refuse the
    # half-built corpus rather than silently training on it
    mod = _load_informative_study()
    dest = tmp_path / "corpus"
    (dest / "grouped").mkdir(parents=True)
    (dest / "corpus_meta.json").write_text(
        json.dumps({"mask_kind": "freeform", "complete": False})
    )
    with pytest.raises(SystemExit, match="INCOMPLETE"):
        mod.main(dest=str(dest), mask_kind="freeform")
