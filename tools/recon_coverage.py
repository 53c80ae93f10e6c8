"""3D-lift coverage accounting for a tested run: who reconstructed, who
dropped, and what the dropped samples' predicted face kinds were.

The wireframe/mesh formulation keeps only plane+cylinder faces by design
(reference reconstruct_to_wireframe.py:46-48), so solids whose predicted
faces are all cone/sphere/torus/B-spline ("Other" type) legitimately
leave too little to solve. This tool writes the benchmarks artifact that
separates that design-drop class from real failures.

    python tools/recon_coverage.py logs/SurfaceFormer/step-native-big-s0 \
        --json benchmarks/reconstruction_step_native.json \
        --what "..." --corpus "..."
"""

import argparse
import glob
import json
import os

#: face types in prediction JSONs: 0=plane, 1=cylinder, 2=other
_KIND = {0: "plane", 1: "cylinder", 2: "other"}


def pred_kind_set(rec: dict) -> str:
    kinds = sorted({_KIND.get(t, "?") for t, _f in rec["pred_faces"]})
    return "+".join(kinds) if kinds else "empty"


def coverage(run_dir: str) -> dict:
    names = sorted(os.path.splitext(os.path.basename(p))[0]
                   for p in glob.glob(os.path.join(run_dir, "json", "*.json")))
    ply = {os.path.splitext(os.path.basename(p))[0]
           for p in glob.glob(os.path.join(run_dir, "ply", "*.ply"))}
    obj = {os.path.splitext(os.path.basename(p))[0]
           for p in glob.glob(os.path.join(run_dir, "obj", "*.obj"))}
    dropped = {}
    for name in names:
        if name in ply and name in obj:
            continue
        with open(os.path.join(run_dir, "json", f"{name}.json")) as f:
            dropped[name] = pred_kind_set(json.load(f))
    return {"n_test": len(names), "ply": len(ply), "obj": len(obj),
            "dropped_pred_face_kinds": dropped}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("run", help="log dir with json/ ply/ obj/")
    parser.add_argument("--json", type=str, default=None)
    parser.add_argument("--what", type=str, default="")
    parser.add_argument("--corpus", type=str, default="")
    parser.add_argument("--date", type=str, default="")
    parser.add_argument("--note", type=str, default="")
    args = parser.parse_args(argv)

    out = coverage(args.run)
    kinds = sorted(set(out["dropped_pred_face_kinds"].values()))
    by_design = sum(1 for k in out["dropped_pred_face_kinds"].values()
                    if "cylinder" not in k.split("+")
                    and k != "empty")
    head = {}
    if args.what:
        head["what"] = args.what
    if args.date:
        head["date"] = args.date
    if args.corpus:
        head["corpus"] = args.corpus
    head.update(out)
    head["dropped_kind_summary"] = {
        "total": len(out["dropped_pred_face_kinds"]),
        "no_plane_or_cylinder_content": by_design,
        "empty_prediction": sum(
            1 for k in out["dropped_pred_face_kinds"].values()
            if k == "empty"),
        "kinds_seen": kinds,
    }
    if args.note:
        head["note"] = args.note
    text = json.dumps(head, indent=1)
    print(text)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
