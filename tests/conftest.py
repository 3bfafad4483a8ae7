from __future__ import annotations

import os
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

sys.path.insert(0, REPO)


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "ner"))


def load_reference_module(name: str):
    """Import a reference module with a rapidfuzz shim (rapidfuzz is not a
    baked-in dependency; our indel-exact fuzz.ratio stands in). Used only by
    differential tests, which skip when /root/reference is absent."""
    if "rapidfuzz" not in sys.modules:
        from x5_ner_spark.core.textnorm import fuzz_ratio, fuzz_wratio

        rf = types.ModuleType("rapidfuzz")

        class _Fuzz:
            @staticmethod
            def ratio(a, b):
                return fuzz_ratio(a, b)

            @staticmethod
            def WRatio(a, b):
                return fuzz_wratio(a, b)

        class _Process:
            # the one call shape the reference makes (infer.py:285-291);
            # backed by our WRatio reimpl so differentials exercise the
            # rapidfuzz-enabled cascade path end to end
            @staticmethod
            def extractOne(query, choices, *, scorer, score_cutoff=0.0):
                best, best_score = None, None
                for c in choices:
                    sc = scorer(query, c)
                    if sc >= score_cutoff and (best_score is None or sc > best_score):
                        best, best_score = c, sc
                return (best, best_score, 0) if best is not None else None

        rf.fuzz = _Fuzz
        rf.process = _Process
        sys.modules["rapidfuzz"] = rf
    if "torch" not in sys.modules:
        # ner/utils.py imports torch only for set_seed; a skeleton suffices
        import importlib.machinery

        import contextlib

        torch = types.ModuleType("torch")
        torch.__spec__ = importlib.machinery.ModuleSpec("torch", loader=None)
        torch.manual_seed = lambda *a, **k: None
        torch.cuda = types.SimpleNamespace(
            is_available=lambda: False, manual_seed_all=lambda *a, **k: None
        )
        # minimal inference surface for driving NERPipeline.predict_bio_tokens
        # with injected probabilities: the fake model emits probabilities AS
        # logits, so softmax is the identity here
        torch.no_grad = contextlib.nullcontext
        torch.softmax = lambda x, dim=-1: x
        sys.modules["torch"] = torch
    stub_transformers()
    if "ner.train" not in sys.modules:
        # ner/train.py drags in datasets/seqeval/yaml; infer.py only needs
        # the CRF class name from it (and only to call .from_pretrained)
        tn = types.ModuleType("ner.train")
        tn.XLMRCRFForTokenClassification = types.SimpleNamespace(from_pretrained=None)
        sys.modules["ner.train"] = tn
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    if name.startswith("scripts."):
        # reference scripts/ is not a package; load by file path
        import importlib.util

        fname = name.split(".", 1)[1] + ".py"
        path = os.path.join(REFERENCE, "scripts", fname)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    return importlib.import_module(name)


@pytest.fixture(scope="session")
def spark():
    from x5_ner_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="x5-ner-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.path.join(TESTDATA, "sf0.001")


def stub_transformers() -> None:
    """The reference imports transformers names at module level (dataset.py
    type hints, infer.py loader classes) but differential tests never call
    the loaders — pipelines are built via __new__ with fakes. One shared stub
    carries every name any reference module pulls in."""
    import importlib.machinery

    if "transformers" not in sys.modules:
        tr = types.ModuleType("transformers")
        tr.__spec__ = importlib.machinery.ModuleSpec("transformers", loader=None)
        tr.AutoTokenizer = types.SimpleNamespace(from_pretrained=None)
        tr.AutoModelForTokenClassification = types.SimpleNamespace(from_pretrained=None)
        sys.modules["transformers"] = tr
    else:
        tr = sys.modules["transformers"]
        for name in ("AutoTokenizer", "AutoModelForTokenClassification"):
            if not hasattr(tr, name):
                setattr(tr, name, types.SimpleNamespace(from_pretrained=None))
