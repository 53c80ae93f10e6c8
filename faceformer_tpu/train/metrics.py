"""Face-level metric engine: the exact contract the rebuild must reproduce.

Definitions (reference: faceformer/trainer.py:153-300):
  - predicted/label token grids parse into (face_type, edge-index tuple)
    faces; single-sequence grids split at EOS then SEP, parallel rows split
    at the first face-type token;
  - coedge datasets additionally filter by enclosedness, compute a
    coedge-sequence accuracy, then map coedges to canonical edges;
  - faces canonicalize to (majority-vote type, sorted unique edge set);
  - TP = exact set match; precision = TP/|pred|, recall = TP/|label|,
    type_acc = type matches / TP;
  - plus a token-level accuracy over non-PAD label positions.

All of this is host-side set arithmetic on small arrays — numpy, not JAX.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from faceformer_tpu.config import PostProcessConfig, TokenConfig
from faceformer_tpu.post_processing import map_coedge_into_edges

Face = Tuple[int, tuple]


def _coedge_seq_accuracy(predict_faces, label_faces) -> Tuple[float, float]:
    """Exact loop-decomposition matches + type agreement among them
    (reference: trainer.py:232-252). Shared by the direction-token and
    coedge eval branches."""
    face_tp = type_tp = 0
    label_set = set(label_faces)
    for pred_type, pred_face in predict_faces:
        for label_type, label_face in label_set:
            if pred_face == label_face:
                face_tp += 1
                if pred_type == label_type:
                    type_tp += 1
                break
    accuracy = face_tp / len(predict_faces) if predict_faces else 0
    type_acc = type_tp / face_tp if predict_faces and face_tp else 0
    return accuracy, type_acc


def parse_faces(
    predicts: np.ndarray, labels: np.ndarray, num_edges: int, tok: TokenConfig
) -> Tuple[List[Face], List[Face]]:
    """Parse flat single-sequence grids (reference: trainer.py:153-177).

    Returns (predict_faces, label_faces); types are always 0 for this task
    flavor."""

    def upto_first_eos(seq):
        return np.split(seq, np.where(seq == tok.EOS)[0] + 1)[0]

    label = upto_first_eos(labels)
    predict = upto_first_eos(predicts)

    label_faces = []
    for chunk in np.split(label, np.where(label == tok.SEP)[0] + 1):
        vals = chunk[:-1] - tok.length  # strip SEP/EOS, remove offset
        vals = vals[(vals >= 0) & (vals < num_edges)]
        if len(vals) > 0:
            label_faces.append((0, tuple(vals.tolist())))

    predict_faces = []
    for chunk in np.split(predict, np.where(predict == tok.SEP)[0] + 1):
        if len(chunk) > 1:
            vals = chunk[:-1] - tok.length
            vals = vals[(vals >= 0) & (vals < num_edges)]
            if len(vals) > 0:
                predict_faces.append((0, tuple(vals.tolist())))

    return predict_faces, label_faces


def parse_directed_faces(
    predicts: np.ndarray, labels: np.ndarray, num_edges: int, tok: TokenConfig
) -> Tuple[List[Face], List[Face]]:
    """Parse flat grids of the --direction_token flavor: faces are streams of
    [edge_pointer, DIR0/DIR1] pairs between SEPs. Malformed fragments (an
    edge pointer without a following DIR token, or vice versa) are skipped —
    the eval-time tolerance for model hallucinations, mirroring the
    out-of-range clipping of the plain parser."""

    def upto_first_eos(seq):
        return np.split(seq, np.where(seq == tok.EOS)[0] + 1)[0]

    def parse(seq):
        faces = []
        for chunk in np.split(seq, np.where(seq == tok.SEP)[0] + 1):
            arr = chunk[:-1] if len(chunk) else chunk
            items, i = [], 0
            while i < len(arr):
                v = int(arr[i]) - tok.length
                if (0 <= v < num_edges and i + 1 < len(arr)
                        and int(arr[i + 1]) in (tok.DIR0, tok.DIR1)):
                    items.append((v, int(arr[i + 1]) - tok.DIR0))
                    i += 2
                else:
                    i += 1
            if items:
                faces.append((0, tuple(items)))
        return faces

    return parse(upto_first_eos(predicts)), parse(upto_first_eos(labels))


def parse_parallel_faces(
    predicts: np.ndarray, labels: np.ndarray, num_edges: int, tok: TokenConfig
) -> Tuple[List[Face], List[Face]]:
    """Parse per-anchor grids (reference: trainer.py:181-208). Each row is
    cut at its first face-type token (which doubles as EOS and encodes the
    type).

    Reference quirk kept on purpose: a row that never emits a type token
    (loop hit max_face_length first) is NOT dropped — `chunk[-1]` is then
    an edge pointer or PAD and the face gets a garbage type (e.g. 39 or
    -1), exactly as the reference's `predict[-1] - face_type_offset` does
    (trainer.py:185-187/198-200). Such faces almost never survive the set
    match, but the per-sample denominators must count them identically."""

    def is_type_token(seq):
        return (seq >= tok.face_type_offset) & (seq < tok.length)

    def parse_rows(rows, clip_to_edges):
        faces = []
        for row in rows:
            chunk = np.split(row, np.where(is_type_token(row))[0] + 1)[0]
            face_type = int(chunk[-1]) - tok.face_type_offset
            vals = chunk - tok.length
            vals = vals[vals >= 0]
            if clip_to_edges:
                vals = vals[vals < num_edges]
            if len(vals) > 0:
                faces.append((face_type, tuple(vals.tolist())))
        return faces

    return parse_rows(predicts, True), parse_rows(labels, False)


class FaceMetrics:
    """Per-batch face metrics (reference: trainer.py:210-300 face_accuracy)."""

    def __init__(self, post_process: PostProcessConfig, tok: TokenConfig):
        self.post_process = post_process
        self.tok = tok

    def evaluate_sample(
        self, predicts: np.ndarray, labels: np.ndarray, raw_data: Dict
    ) -> Dict:
        edges = raw_data["edges"]
        if labels.ndim == 2:
            predict_faces, label_faces = parse_parallel_faces(
                predicts, labels, len(edges), self.tok)
        elif self.post_process.direction_token:
            predict_faces, label_faces = parse_directed_faces(
                predicts, labels, len(edges), self.tok)
        else:
            predict_faces, label_faces = parse_faces(
                predicts, labels, len(edges), self.tok)

        out: Dict = {}
        # the oriented flavors share the filter -> coedge-seq-accuracy ->
        # flatten-to-edge-sets pipeline; only the final mapping differs
        to_edge_sets = None
        if self.post_process.direction_token:
            # oriented loops must chain; after the filter, orientation has
            # served its purpose and faces compare as undirected edge sets
            # (the flavor stores each undirected edge once)
            def to_edge_sets(faces):
                return [
                    (ftype, [i for loop in loops for (i, _o) in loop])
                    for ftype, loops in faces
                ]
        elif self.post_process.is_coedge:
            # default {}: label-free predict (tools/predict.py) runs on raw
            # wireframe JSONs that carry no pairings; mapping then keeps
            # coedge indices as-is. Dataset JSONs always include pairings.
            pairings = raw_data.get("pairings", {})

            def to_edge_sets(faces):
                return [
                    (ftype, map_coedge_into_edges(
                        pairings, [i for loop in loops for i in loop]))
                    for ftype, loops in faces
                ]

        if to_edge_sets is not None:
            # one C call per sample when the native kernel is built;
            # byte-identical to the Python predicate (parity-tested)
            from faceformer_tpu.geometry.native import (
                filter_faces_by_encloseness_batch,
            )

            tol = self.post_process.enclosedness_tol
            predict_faces = filter_faces_by_encloseness_batch(
                edges, predict_faces, tol)
            label_faces = filter_faces_by_encloseness_batch(
                edges, label_faces, tol)
            out["accuracy"], out["type_acc_coedge_seq"] = _coedge_seq_accuracy(
                predict_faces, label_faces)
            predict_faces = to_edge_sets(predict_faces)
            label_faces = to_edge_sets(label_faces)

        # canonicalize: dedup labels, majority-vote predicted types
        # (reference: trainer.py:257-269)
        label_set = list({(ft, tuple(sorted(set(ix)))) for ft, ix in label_faces})
        by_face: Dict[tuple, List[int]] = {}
        for ftype, indices in predict_faces:
            by_face.setdefault(tuple(sorted(set(indices))), []).append(ftype)
        predict_set = [
            (Counter(types).most_common(1)[0][0], face) for face, types in by_face.items()
        ]

        face_tp = type_tp = 0
        for pred_type, pred_face in predict_set:
            for label_type, label_face in label_set:
                if pred_face == label_face:
                    face_tp += 1
                    if pred_type == label_type:
                        type_tp += 1
                    break

        if not predict_set or not label_set:
            out.update(precision=0, recall=0, type_acc=0)
        else:
            out["precision"] = face_tp / len(predict_set)
            out["recall"] = face_tp / len(label_set)
            out["type_acc"] = type_tp / face_tp if face_tp else 0
        out["predictions"] = predict_set
        out["labels"] = label_set
        return out

    def evaluate_batch(
        self,
        predicts: np.ndarray,
        labels: np.ndarray,
        raw_datas: Sequence[Dict],
        sample_valid: Sequence[bool] | None = None,
    ) -> Dict[str, List]:
        """Evaluate every sample in a batch; returns dict-of-lists plus the
        batch token accuracy over labels > PAD (reference: trainer.py:296-300).

        Reference quirk kept on purpose: for the PARALLEL model this
        elementwise grid comparison pairs decode rows (anchored per edge
        index) with label rows (packed in face/loop/rotation enumeration
        order, data_para.py:71-95) — the rows generally correspond to
        different rotations, so even a perfect model scores < 1.0. The
        reference computes the same number on the same grids; it is a
        training-progress diagnostic there and here, never a headline
        metric (checkpoint selection uses valid_precision). The flat
        model's rows are aligned (SOS at column 0 both sides), where this
        is a true token accuracy."""
        results: Dict[str, List] = {
            k: []
            for k in ("precision", "recall", "type_acc", "accuracy",
                      "type_acc_coedge_seq", "predictions", "labels")
        }
        for i in range(len(labels)):
            if sample_valid is not None and not sample_valid[i]:
                continue
            out = self.evaluate_sample(predicts[i], labels[i], raw_datas[i])
            for key in results:
                if key in out:
                    results[key].append(out[key])

        valid = labels > self.tok.PAD
        if sample_valid is not None:
            valid = valid & np.asarray(sample_valid).reshape(
                -1, *([1] * (labels.ndim - 1)))
        acc_sum = (valid & (predicts == labels)).sum()
        results["token_accuracy"] = float(acc_sum / max(valid.sum(), 1))
        return results
