"""Suite-scale fuzz of the native STEP reader's robustness contract.

Full runs live in tools/fuzz_step_reader.py (--num 300); this keeps a
fast deterministic slice in CI so regressions in the untrusted-input
boundary (step21.read_brep) surface immediately.

Last full clean runs: 2026-08-20, seeds 0 and 1, 108 + 308 inputs,
zero violations (clean/ok only), peak RSS 347 MB.
"""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_step_reader import (  # noqa: E402
    make_seeds, mutate, pathological, run_one)


@pytest.fixture(scope="module")
def seed_texts():
    return make_seeds(7, 6)


def _run_text(tmp_path, name, text):
    path = os.path.join(str(tmp_path), name + ".step")
    with open(path, "w") as f:
        f.write(text)
    return run_one(path, watchdog=10)


def test_pathological_payloads_fail_cleanly(tmp_path):
    for name, text in pathological():
        status, detail = _run_text(tmp_path, name, text)
        assert status in ("ok", "none", "clean"), (name, status, detail)


def test_mutated_writer_output_never_escapes_contract(tmp_path, seed_texts):
    rng = random.Random(11)
    for k in range(40):
        text = mutate(rng.choice(seed_texts), rng)
        status, detail = _run_text(tmp_path, f"mut{k:02d}", text)
        assert status in ("ok", "none", "clean"), (k, status, detail)


def test_depth_cap_is_a_syntax_error():
    from faceformer_tpu.tools.step21 import StepSyntaxError, parse_step_text

    deep = "DATA;\n#1 = FOO(" + "(" * 200 + "1" + ")" * 200 + ");\nENDSEC;"
    with pytest.raises(StepSyntaxError, match="nesting exceeds"):
        parse_step_text(deep)


def test_resolver_errors_become_syntax_errors(tmp_path):
    """A dangling ref inside a well-formed file maps to StepSyntaxError."""
    from faceformer_tpu.tools.step21 import (
        StepSyntaxError, brep_cylinder, read_brep)

    text = brep_cylinder(0.7, 1.1)
    # rewire the MANIFOLD_SOLID_BREP's shell ref to a missing entity
    import re

    m = re.search(r"MANIFOLD_SOLID_BREP\('([^']*)',#(\d+)\)", text)
    assert m is not None
    text = text.replace(m.group(0),
                        f"MANIFOLD_SOLID_BREP('{m.group(1)}',#999999)", 1)
    path = os.path.join(str(tmp_path), "dangling.step")
    with open(path, "w") as f:
        f.write(text)
    with pytest.raises(StepSyntaxError, match="dangling reference"):
        read_brep(path)


def test_structural_errors_wrap_to_syntax_errors(tmp_path):
    """An entity with the wrong arity (a CARTESIAN_POINT stripped to a
    bare name) exercises read_brep's generic boundary wrap."""
    import re

    from faceformer_tpu.tools.step21 import (
        StepSyntaxError, brep_cylinder, read_brep)

    text = brep_cylinder(0.7, 1.1)
    row = re.search(r"#(\d+) = CARTESIAN_POINT\('',\([^)]*\)\) ;", text)
    assert row is not None
    text = text.replace(row.group(0),
                        f"#{row.group(1)} = CARTESIAN_POINT('') ;", 1)
    path = os.path.join(str(tmp_path), "arity.step")
    with open(path, "w") as f:
        f.write(text)
    with pytest.raises(StepSyntaxError):
        read_brep(path)


def test_aggregate_cap_is_a_syntax_error():
    """A flat aggregate past _MAX_AGG_ITEMS rejects early on the lazy
    token stream (bounded work even when the payload tail is megabytes)."""
    from faceformer_tpu.tools.step21 import (
        _MAX_AGG_ITEMS, StepSyntaxError, parse_step_text)

    body = ",".join(["0."] * (_MAX_AGG_ITEMS + 2))
    text = f"DATA;\n#1 = CARTESIAN_POINT('',({body}));\nENDSEC;"
    with pytest.raises(StepSyntaxError, match="aggregate exceeds"):
        parse_step_text(text)
