"""Fuzz the native Part 21 STEP reader (faceformer_tpu/tools/step21.py).

The reader parses UNTRUSTED files with a recursive-descent grammar and an
entity-graph resolver, so this harness feeds it mutated writer output and
hostile hand-built payloads and asserts the reference's robustness
contract (the 5 s watchdog posture around OCC's reader,
read_step_file.py:9):

  * bounded time  — every input finishes inside --watchdog seconds;
  * bounded memory — peak RSS growth across the run stays under
    --max-rss-mb;
  * clean failure — the only exceptions that may escape ``load_solid``
    are ``UnsupportedStep`` / ``StepSyntaxError`` (or the loader's own
    ``AssertionError("no shape to transfer")`` for shapeless files).

Seeds are drawn from the 14 corpus writer families via
``tools/gen_step_solids.random_step_solid`` (no corpus on disk needed).
Mutations cover three classes:

  1. byte level  — flip / delete / insert / duplicate ranges;
  2. token level — rewire ``#n`` refs (dangling, retyped, self-cyclic),
     replace numbers (1e999, -0.0, 1e-300, 0), drop / duplicate entity
     rows, truncate mid-entity;
  3. structural payloads — deep aggregate nesting, long ref cycles,
     giant flat aggregates, missing DATA/ENDSEC, null refs in mandatory
     slots.

Run:  python tools/fuzz_step_reader.py --num 300 --seed 0
Last clean run: see the docstring-adjacent note in tests/test_fuzz_step_reader.py.
"""

import argparse
import os
import random
import re
import resource
import signal
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REF = re.compile(r"#(\d+)")
_NUM = re.compile(r"[+-]?\d+\.\d*(?:[eE][+-]?\d+)?")
_ROW = re.compile(r"^#\d+ = .*;$", re.MULTILINE)

_BAD_NUMBERS = ["1e999", "-1e999", "-0.0", "1e-300", "0", "99999999999999999999"]


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def make_seeds(rng_seed: int, count: int):
    """STEP texts covering the writer families (composites included)."""
    import numpy as np

    from tools.gen_step_solids import random_composite, random_step_solid

    rng = np.random.default_rng(rng_seed)
    seeds = []
    for k in range(count):
        fn = random_composite if k % 3 == 0 else random_step_solid
        seeds.append(fn(rng, f"fuzz{k:03d}"))
    return seeds


def mutate(text: str, rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.30:  # byte level
        buf = bytearray(text.encode())
        for _ in range(rng.randint(1, 25)):
            if not buf:
                break
            i = rng.randrange(len(buf))
            op = rng.random()
            if op < 0.4:
                buf[i] = rng.randrange(256)
            elif op < 0.7:
                del buf[i:i + rng.randint(1, 40)]
            else:
                buf[i:i] = bytes(rng.randrange(256)
                                 for _ in range(rng.randint(1, 20)))
        return buf.decode(errors="replace")
    if kind < 0.55:  # rewire refs
        ids = [int(m) for m in _REF.findall(text)]
        if not ids:
            return text
        out = text
        for _ in range(rng.randint(1, 6)):
            src = rng.choice(ids)
            dst = rng.choice([rng.choice(ids), src,
                              max(ids) + rng.randint(1, 999)])
            # replace ONE occurrence somewhere after a '(' so we rewire an
            # argument, not redefine the entity id
            pat = re.compile(r"(\(|,\s*)#%d\b" % src)
            out, _n = pat.subn(lambda m: m.group(1) + f"#{dst}", out, count=1)
        return out
    if kind < 0.75:  # numbers
        def repl(m):
            return rng.choice(_BAD_NUMBERS) if rng.random() < 0.2 else m.group(0)

        return _NUM.sub(repl, text)
    if kind < 0.9:  # drop / duplicate rows
        rows = _ROW.findall(text)
        if not rows:
            return text
        row = rng.choice(rows)
        if rng.random() < 0.5:
            return text.replace(row + "\n", "", 1)
        return text.replace(row, row + "\n" + row, 1)
    # truncate
    return text[:rng.randrange(max(len(text) // 4, 1), len(text))]


def pathological():
    yield "empty", ""
    yield "no_data", "ISO-10303-21;\nHEADER;\nENDSEC;\nEND-ISO-10303-21;"
    yield "unterminated", "DATA;\n#1 = FOO((1,2,"
    yield "deep_nesting", ("DATA;\n#1 = FOO(" + "(" * 5000 + "1"
                           + ")" * 5000 + ");\nENDSEC;")
    yield "giant_flat", ("DATA;\n#1 = CARTESIAN_POINT(''"
                         + ",(0.,1.,2.)" * 200000 + ");\nENDSEC;")
    cyc = ["DATA;"]
    for i in range(1, 2001):
        cyc.append(f"#{i} = EDGE_LOOP('',(#{i % 2000 + 1}));")
    cyc.append("#3000 = MANIFOLD_SOLID_BREP('x',#1);")
    cyc.append("ENDSEC;")
    yield "long_cycle", "\n".join(cyc)
    yield "null_refs", ("DATA;\n#1 = MANIFOLD_SOLID_BREP('x',$);\n"
                        "#2 = ADVANCED_FACE('',($),$,.T.);\nENDSEC;")
    yield "star_everywhere", ("DATA;\n#1 = MANIFOLD_SOLID_BREP(*,*);\n"
                              "ENDSEC;")


def run_one(path: str, watchdog: int):
    """-> (status, detail). status in {ok, none, clean, TIMEOUT, <ExcName>}."""
    from faceformer_tpu.tools import step_native
    from faceformer_tpu.tools.step21 import StepSyntaxError, UnsupportedStep

    import numpy as np

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(watchdog)
    try:
        # mutated numbers legitimately produce inf/nan intermediates; the
        # contract is about exceptions and bounds, not FP warnings
        with np.errstate(all="ignore"):
            solid, n = step_native.load_solid(path)
        return ("ok" if solid is not None else "none"), f"{n} shapes"
    except (UnsupportedStep, StepSyntaxError) as exc:
        return "clean", f"{type(exc).__name__}: {str(exc)[:60]}"
    except AssertionError as exc:
        if "no shape to transfer" in str(exc):
            return "clean", "no shape to transfer"
        return "AssertionError", str(exc)[:120]
    except _Timeout:
        return "TIMEOUT", f"exceeded {watchdog}s"
    except Exception as exc:  # noqa: BLE001 — the fuzz oracle itself
        return type(exc).__name__, str(exc)[:120]
    finally:
        signal.alarm(0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--seeds", type=int, default=24,
                        help="writer-family seed corpus size")
    parser.add_argument("--watchdog", type=int, default=5)
    parser.add_argument("--max-rss-mb", type=int, default=2048)
    parser.add_argument("--save-failures", default=None,
                        help="directory to dump inputs that violated the "
                             "contract")
    args = parser.parse_args(argv)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    seeds = make_seeds(args.seed, args.seeds)
    rng = random.Random(args.seed)
    workdir = tempfile.mkdtemp(prefix="fuzz_step_")

    cases = [(f"path_{name}", text) for name, text in pathological()]
    for k in range(args.num):
        cases.append((f"mut_{k:04d}", mutate(rng.choice(seeds), rng)))

    tally = {}
    violations = []
    for name, text in cases:
        path = os.path.join(workdir, name + ".step")
        with open(path, "w") as f:
            f.write(text)
        status, detail = run_one(path, args.watchdog)
        tally[status] = tally.get(status, 0) + 1
        if status not in ("ok", "none", "clean"):
            violations.append((name, status, detail))
            if args.save_failures:
                os.makedirs(args.save_failures, exist_ok=True)
                with open(os.path.join(args.save_failures,
                                       name + ".step"), "w") as f:
                    f.write(text)
        os.remove(path)

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(f"{len(cases)} inputs: " +
          ", ".join(f"{k}={v}" for k, v in sorted(tally.items())))
    print(f"peak RSS {rss1:.0f} MB (start {rss0:.0f} MB)")
    for name, status, detail in violations[:20]:
        print(f"  VIOLATION {name}: {status}: {detail}")
    if rss1 - rss0 > args.max_rss_mb:
        print(f"MEMORY VIOLATION: grew {rss1 - rss0:.0f} MB "
              f"> {args.max_rss_mb} MB")
        return 1
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
