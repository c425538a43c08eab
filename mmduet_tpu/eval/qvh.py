"""QVHighlights highlight-detection metrics: HL-mAP and HL-Hit@1.

Metric definitions follow the official moment_detr evaluation the
reference vendors (`test/qvh/eval.py:222-246`, `test/qvh/utils.py:169-209`):

- gt saliency: per-2s-clip scores from 3 workers in [0,4]; binarized at
  min score Fair(2)/Good(3)/VeryGood(4);
- HL-Hit@1: does the top-scored predicted clip hit a positive clip
  (max over the 3 workers), averaged over queries;
- HL-mAP: interpolated AP of predicted clip scores vs each worker's binary
  labels, averaged over workers and queries.

The AP here recomputes sklearn's precision_recall_curve in plain numpy
(descending-score cut points) with the same interpolation + "precision at
each newly recalled sample" averaging.

The MMDuet prediction path (`test/evaluate.py:308-345`): per-frame
relevance scores → smooth (window sweep) → sum into 2-second clip scores.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .span_utils import parse_debug_scores, smooth_scores


def _precision_recall_curve(y_true: np.ndarray, y_score: np.ndarray):
    order = np.argsort(-y_score, kind="stable")
    y_true = y_true[order]
    tp = np.cumsum(y_true)
    # group ties: keep only the last index of each distinct score
    scores_sorted = y_score[order]
    distinct = np.r_[np.nonzero(np.diff(scores_sorted))[0], len(scores_sorted) - 1]
    tp = tp[distinct]
    fp = (distinct + 1) - tp
    total_pos = y_true.sum()
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / max(total_pos, 1)
    # sklearn returns the curve in ascending-threshold order with a final
    # (precision=1, recall=0) point appended — replicate exactly, because
    # the reference's forward max-interpolation depends on this ordering
    precision = np.r_[precision[::-1], 1.0]
    recall = np.r_[recall[::-1], 0.0]
    return precision, recall


def average_precision(y_true: Sequence[float], y_score: Sequence[float]) -> float:
    """Interpolated AP (video2gif / moment_detr convention)."""
    y_true = np.asarray(y_true, float)
    y_score = np.asarray(y_score, float)
    uniq = set(y_true.tolist())
    if uniq == {0.0}:
        return 0.0
    if uniq == {1.0}:
        return 1.0
    precision, recall = _precision_recall_curve(y_true, y_score)
    # curves above are in descending-threshold order like sklearn's output
    for i in range(1, len(precision)):
        precision[i] = max(precision[i - 1], precision[i])
    idx = np.where(np.diff(recall))[0]
    return float(np.mean(precision[idx]))


def mk_gt_scores(gt: dict, clip_length: float = 2.0) -> np.ndarray:
    ids = np.array(gt["relevant_clip_ids"])
    num_clips = int(gt["duration"] / clip_length)
    if len(ids) and int(ids.max()) >= num_clips:
        # the reference would IndexError here (`test/qvh/utils.py`); we
        # grow the clip axis instead, but LOUDLY — a grown axis changes
        # the AP denominator, so malformed gold must be visible
        import warnings

        warnings.warn(
            f"qid={gt.get('qid')}: relevant_clip_ids up to {int(ids.max())} "
            f"exceed duration/{clip_length}={num_clips} clips; growing the "
            "clip axis (malformed gold annotation?)",
            stacklevel=2,
        )
        num_clips = int(ids.max()) + 1
    full = np.zeros((num_clips, 3))
    full[ids] = np.array(gt["saliency_scores"])
    return full


def eval_highlight(
    submission: Sequence[dict], ground_truth: Sequence[dict]
) -> Dict[str, Dict[str, float]]:
    qid2pred = {d["qid"]: np.array(d["pred_saliency_scores"], float) for d in submission}
    qid2gt = {d["qid"]: mk_gt_scores(d) for d in ground_truth}
    out = {}
    for min_score, name in zip((2, 3, 4), ("Fair", "Good", "VeryGood")):
        hits = np.zeros((len(qid2pred), 3))
        aps = np.zeros((len(qid2pred), 3))
        for i, (qid, pred) in enumerate(qid2pred.items()):
            gt_bin = (qid2gt[qid] >= min_score).astype(float)  # (#clips, 3)
            top = int(np.argmax(pred))
            if top < len(gt_bin):
                hits[i] = gt_bin[top]
            for w in range(3):
                y_true = gt_bin[:, w]
                y_pred = pred
                if len(y_true) < len(y_pred):
                    y_pred = y_pred[: len(y_true)]
                elif len(y_true) > len(y_pred):
                    y_pred = np.r_[y_pred, np.zeros(len(y_true) - len(y_pred))]
                aps[i, w] = average_precision(y_true, y_pred)
        out[f"HL-min-{name}"] = {
            "HL-mAP": float(f"{100 * aps.mean():.2f}"),
            "HL-Hit1": float(f"{100 * hits.max(1).mean():.2f}"),
        }
    return out


def eval_submission(
    submission: Sequence[dict], ground_truth: Sequence[dict],
    match_number: bool = True,
) -> Dict:
    pred_qids = {e["qid"] for e in submission}
    gt_qids = {e["qid"] for e in ground_truth}
    if match_number:
        assert pred_qids == gt_qids
    else:
        shared = pred_qids & gt_qids
        submission = [e for e in submission if e["qid"] in shared]
        ground_truth = [e for e in ground_truth if e["qid"] in shared]
    hl = eval_highlight(submission, ground_truth)
    brief = {
        f"{k}-{sub.split('-')[1]}": v[sub] for k, v in hl.items() for sub in v
    }
    return {"brief": brief, **hl}


def preds_to_saliency(
    pred_examples: Sequence[dict], smooth_window: int,
    score_head: str = "relevance_score",
) -> List[dict]:
    """Per-frame scores → 2-sec clip saliency sums (reference
    `evaluate.py:317-330`)."""
    out = []
    for ex in pred_examples:
        times, scores = parse_debug_scores(ex["debug_data"], score_head)
        if len(times) < 2:
            continue
        frame_interval = times[1] - times[0]
        per_clip = max(1, int(round(2.0 / frame_interval)))
        scores = smooth_scores(scores, smooth_window)
        saliency = [
            float(sum(scores[i : i + per_clip]))
            for i in range(0, len(scores), per_clip)
        ]
        out.append({"qid": ex["question_id"], "pred_saliency_scores": saliency})
    return out


def evaluate_qvh(
    pred_examples: Sequence[dict], gold_examples: Sequence[dict],
    smooth_windows: Sequence[int] = range(0, 15),
) -> List[dict]:
    results = []
    for window in smooth_windows:
        sub = preds_to_saliency(pred_examples, window)
        res = eval_submission(sub, gold_examples, match_number=False)
        results.append({"smooth_window_size": window, "results": res})
    return results
