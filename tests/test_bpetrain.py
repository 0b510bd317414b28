"""Distributed BPE training: byte-for-byte equality with the serial
learner (scripts/learn_bpe.py) and with the committed merge table
the token-counting query uses."""

import importlib.util
import os

from bike_analyzer_spark.operators import bpetrain, text
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE


def _serial_learn(sf_dir: str, n: int):
    spec = importlib.util.spec_from_file_location(
        "learn_bpe",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "learn_bpe.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.learn(sf_dir, n)


def test_distributed_equals_serial_at_smoke(spark):
    got = bpetrain.learn_bpe(spark, SF_DIR_SMOKE, 12)
    want = _serial_learn(SF_DIR_SMOKE, 12)
    assert got == want
    assert len(got) == 12


def test_distributed_reproduces_committed_constant(spark):
    """The engine can retrain its own embedded tokenizer table: the
    distributed learner at the constant's training SF reproduces
    text.BPE_MERGES exactly."""
    got = bpetrain.learn_bpe(spark, SF_DIR_ORACLE, bpetrain.N_MERGES)
    assert tuple(got) == text.BPE_MERGES
