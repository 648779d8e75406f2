"""Emotion-feature preprocessing.

Record-for-record reimplementation of the semantics of
``/root/reference/src/data/preprocess_features.py`` (pinned by
tests/test_loader.py::test_feature_parity_with_reference) on plain numpy
arrays: CSV -> per-song records with valence/arousal labels min-max scaled
to [-1, 1] (or quantile-binned into discrete emotion token symbols), IQR
outlier removal, and the deterministic 5% test split of the matched subset
sorted by file.

Two reference quirks are reproduced deliberately:
 * the split boundary row belongs to BOTH train and test (the reference's
   inclusive ``.loc`` slicing, preprocess_features.py:77-78);
 * the top quantile edge is nudged by 1e-6 so the max value lands in the
   last real bin (preprocess_features.py:55).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _binned(x: np.ndarray, prefix: str, n_bins: int) -> np.ndarray:
    """Quantile-bin a scaled feature into '<V-2>'..'<V2>'-style symbols
    (NaN -> None)."""
    if n_bins % 2 == 0:
        ids = list(range(-n_bins // 2, 0)) + list(range(1, n_bins // 2 + 1))
    else:
        ids = list(range(-(n_bins - 1) // 2, (n_bins - 1) // 2 + 1))
    names = np.array([f"<{prefix}{b}>" for b in ids] + [None], object)
    edges = np.nanquantile(x, np.linspace(0.0, 1.0, n_bins + 1))
    edges[-1] += 1e-6
    # NaN searchsorts past every edge -> index n_bins -> the None bucket
    return names[np.digitize(x, edges) - 1]


def preprocess_features(
    feature_file: str,
    n_bins: Optional[int] = None,
    min_n_instruments: int = 3,
    test_ratio: float = 0.05,
    outlier_range: float = 1.5,
    conditional: bool = True,
    use_labeled_only: bool = True,
) -> Tuple[List[dict], List[dict]]:
    """Returns (train_records, test_records), each a list of dicts with
    keys "file" and (if conditional) "valence"/"arousal"."""
    import pandas as pd  # CSV ingestion only (robust NaN/bool parsing)

    raw = pd.read_csv(feature_file)
    files = raw["file"].to_numpy()
    valence = raw["valence"].to_numpy(np.float64)
    arousal = raw["note_density_per_instrument"].to_numpy(np.float64)
    matched = raw["is_matched"].to_numpy(bool)

    with np.errstate(invalid="ignore"):
        # row filters: enough instruments, nonzero valence (NaN labels kept)
        keep = (raw["n_instruments"].to_numpy() >= min_n_instruments) & (
            valence != 0
        )
        files, valence, arousal, matched = (
            a[keep] for a in (files, valence, arousal, matched)
        )

        # IQR outlier removal, both features judged on the same base rows
        def inlier(x: np.ndarray) -> np.ndarray:
            q1, q3 = np.nanquantile(x, 0.25), np.nanquantile(x, 0.75)
            margin = outlier_range * (q3 - q1)
            return ~((x < q1 - margin) | (x > q3 + margin))  # NaN stays

        keep = inlier(valence) & inlier(arousal)
        files, valence, arousal, matched = (
            a[keep] for a in (files, valence, arousal, matched)
        )

    def rescale(x: np.ndarray) -> np.ndarray:
        lo, hi = np.nanmin(x), np.nanmax(x)
        return (x - lo) / (hi - lo) * 2 - 1

    valence, arousal = rescale(valence), rescale(arousal)

    if n_bins is not None:
        valence = _binned(valence, "V", n_bins)
        arousal = _binned(arousal, "A", n_bins)

    def labeled(idx: np.ndarray) -> np.ndarray:
        """Rows whose BOTH labels are present."""
        if n_bins is not None:
            ok = (valence[idx] != None) & (arousal[idx] != None)  # noqa: E711
        else:
            ok = ~(np.isnan(valence[idx]) | np.isnan(arousal[idx]))
        return idx[ok]

    # deterministic split: matched subset sorted by file; the boundary row
    # appears in both splits (reference parity, see module docstring)
    m_idx = np.flatnonzero(matched)
    m_idx = m_idx[np.argsort(files[m_idx], kind="stable")]
    n_test = round(len(m_idx) * test_ratio)
    test_idx = m_idx[len(m_idx) - n_test :]
    train_idx = m_idx[: len(m_idx) - n_test + 1]
    if not use_labeled_only:
        u_idx = np.flatnonzero(~matched)
        train_idx = np.concatenate([train_idx, u_idx])
        train_idx = train_idx[np.argsort(files[train_idx], kind="stable")]

    test_idx = labeled(test_idx)
    if use_labeled_only:
        train_idx = labeled(train_idx)

    def records(idx: np.ndarray) -> List[dict]:
        out = []
        for i in idx:
            rec = {"file": files[i]}
            if conditional:
                for key, col in (("valence", valence), ("arousal", arousal)):
                    v = col[i]
                    if n_bins is None:
                        v = None if np.isnan(v) else float(v)
                    rec[key] = v
                out.append(rec)
            else:
                out.append(rec)
        return out

    return records(train_idx), records(test_idx)
