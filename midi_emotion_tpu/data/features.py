"""Emotion-feature preprocessing.

Reproduces ``/root/reference/src/data/preprocess_features.py`` semantics:
CSV -> per-song records with valence/arousal labels scaled to [-1, 1]
(or quantile-binned into discrete emotion token symbols), IQR outlier
removal, and the deterministic matched-data 5% test split sorted by file.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd


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
    data = pd.read_csv(feature_file)
    mapper = {"valence": "valence", "note_density_per_instrument": "arousal"}
    data = data.rename(columns=mapper)
    columns = data.columns.to_list()

    # filters (preprocess_features.py:15-17)
    data = data[data["n_instruments"] >= min_n_instruments]
    data = data[data["valence"] != 0]

    # IQR outlier removal (:20-32)
    feature_labels = list(mapper.values())
    outlier_indices: List = []
    for label in feature_labels:
        series = data[label]
        q1, q3 = series.quantile(0.25), series.quantile(0.75)
        iqr = q3 - q1
        outlier_indices += series[series < q1 - outlier_range * iqr].index.to_list()
        outlier_indices += series[series > q3 + outlier_range * iqr].index.to_list()
    data = data.drop(outlier_indices)

    # min-max scale to [-1, 1] (:35-40)
    for label in feature_labels:
        series = data[label]
        lo, hi = series.min(), series.max()
        data[label] = (data[label] - lo) / (hi - lo) * 2 - 1

    if n_bins is not None:
        # quantile binning into emotion token symbols (:42-64)
        quantile_indices = np.linspace(0, 1, n_bins + 1)
        for label in feature_labels:
            if n_bins % 2 == 0:
                bin_ids = list(range(-n_bins // 2, 0)) + list(
                    range(1, n_bins // 2 + 1)
                )
            else:
                bin_ids = list(range(-(n_bins - 1) // 2, (n_bins - 1) // 2 + 1))
            token_labels = [f"<{label[0].upper()}{b}>" for b in bin_ids]
            token_labels.append(None)  # NaN bucket
            series = data[label]
            quantiles = [series.quantile(q) for q in quantile_indices]
            quantiles[-1] += 1e-6
            digitized = np.digitize(series.to_numpy(), quantiles)
            data[label] = [token_labels[i - 1] for i in digitized]
    else:
        data = data.where(pd.notnull(data), None)

    # deterministic split of matched data (:69-86)
    matched = data[data["is_matched"]]
    unmatched = data[~data["is_matched"]]
    matched = matched.sort_values("file").reset_index(drop=True)
    n_test = round(len(matched) * test_ratio)
    test_split = matched.loc[len(matched) - n_test : len(matched)]
    train_split = matched.loc[: len(matched) - n_test]
    if not use_labeled_only:
        train_split = pd.concat([train_split, unmatched])
        train_split = train_split.sort_values("file").reset_index(drop=True)

    splits = [train_split, test_split]
    columns_to_drop = [c for c in columns if c not in ("file", "valence", "arousal")]
    if not conditional:
        columns_to_drop += ["valence", "arousal"]

    for label in feature_labels:
        splits[1] = splits[1][~splits[1][label].isnull()]
        if use_labeled_only:
            splits[0] = splits[0][~splits[0][label].isnull()]

    out = []
    for split in splits:
        split = split.drop(columns=columns_to_drop, errors="ignore")
        out.append(split.to_dict("records"))
    return out[0], out[1]
