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
        from x5_ner_spark.core.textnorm import fuzz_ratio

        rf = types.ModuleType("rapidfuzz")

        class _Fuzz:
            @staticmethod
            def ratio(a, b):
                return fuzz_ratio(a, b)

        rf.fuzz = _Fuzz
        rf.process = None
        sys.modules["rapidfuzz"] = rf
    if "torch" not in sys.modules:
        # ner/utils.py imports torch only for set_seed; a skeleton suffices
        import importlib.machinery

        torch = types.ModuleType("torch")
        torch.__spec__ = importlib.machinery.ModuleSpec("torch", loader=None)
        torch.manual_seed = lambda *a, **k: None
        torch.cuda = types.SimpleNamespace(
            is_available=lambda: False, manual_seed_all=lambda *a, **k: None
        )
        sys.modules["torch"] = torch
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
    """ner/dataset.py imports transformers only for type hints / encode paths
    we don't exercise; a named stub lets differential tests import it."""
    import importlib.machinery

    if "transformers" not in sys.modules:
        tr = types.ModuleType("transformers")
        tr.__spec__ = importlib.machinery.ModuleSpec("transformers", loader=None)
        tr.AutoTokenizer = object
        sys.modules["transformers"] = tr
