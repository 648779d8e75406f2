"""Dataset-label creation pipeline driver.

Resumable 9-stage port of the reference's ``src/create_dataset/run.py``
(each stage cached to JSON with a --redo flag), built on the pure functions
in ``midi_emotion_tpu.data.dataset_builder``. The Spotify stage is a
network boundary: in offline environments supply --spotify_csv with a
pre-fetched ``incomplete_trackid_to_spotify_features.csv`` (the reference's
own resume format, run.py:119-136) and the rest of the pipeline runs
unchanged.

Usage:
    python create_dataset/run.py \
        --match_scores data_files/match_scores.json \
        --msd_summary data_files/msd_summary_file.h5 \
        --echonest_dir data_files/millionsongdataset_echonest \
        --dataset_dir data_files/lpd_full/lpd/lpd_full \
        --out_dir data_files/features/pianoroll
"""

import argparse
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from midi_emotion_tpu.data import dataset_builder as db  # noqa: E402


def _feat_task(task):
    """Module-level stage-7 worker (picklable for the process pool)."""
    f_, dataset_dir, extension = task
    path = os.path.join(dataset_dir, f_[0], f_ + extension)
    if not os.path.exists(path):
        path = os.path.join(dataset_dir, f_ + extension)
    return f_, db.midi_features_from_pianoroll(path)


def cached(path, redo, fn):
    if os.path.exists(path) and not redo:
        with open(path) as f:
            return json.load(f)
    out = fn()
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"Output saved to {path}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--match_scores", required=True)
    ap.add_argument("--msd_summary", default=None)
    ap.add_argument("--echonest_dir", default=None)
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--extension", default=".npz", choices=[".npz", ".mid"])
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--spotify_csv", default=None,
                    help="pre-fetched incomplete_trackid_to_spotify_features.csv")
    ap.add_argument("--spotify_client_id", default="")
    ap.add_argument("--spotify_client_secret", default="")
    ap.add_argument("--redo", action="store_true")
    ap.add_argument("--n_workers", type=int, default=16)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    out = lambda name: os.path.join(args.out_dir, name)

    with open(args.match_scores) as f:
        match_scores = json.load(f)

    # 1. track_id -> metadata
    def stage1():
        assert args.msd_summary, "--msd_summary required (or cache the stage)"
        return db.msd_trackid_to_metadata(
            args.msd_summary, sorted(match_scores.keys())
        )

    trackid_to_songid = cached(out("trackid_to_songid.json"), args.redo, stage1)

    # 2. song_id -> spotify ids
    def stage2():
        assert args.echonest_dir, "--echonest_dir required (or cache the stage)"
        result = {}
        for meta in trackid_to_songid.values():
            sid = meta["song_id"]
            p = os.path.join(args.echonest_dir, sid[2:4], sid + ".json")
            result[sid] = db.get_spotify_ids(p) if os.path.exists(p) else []
        return result

    songid_to_spotify = cached(out("songid_to_spotify.json"), args.redo, stage2)

    # 3. spotify features (network or prefetched csv)
    def stage3():
        csv_path = args.spotify_csv or out(
            "incomplete_trackid_to_spotify_features.csv"
        )
        if args.spotify_csv is None:
            client = db.make_spotipy_client(
                args.spotify_client_id, args.spotify_client_secret
            )
        else:
            client = None  # everything already in the csv
            assert os.path.exists(csv_path), csv_path
        if client is not None:
            return db.fetch_spotify_features(
                trackid_to_songid, songid_to_spotify, client, csv_path
            )
        return db.fetch_spotify_features({}, {}, None, csv_path)

    trackid_to_features = cached(
        out("trackid_to_spotify_features.json"), args.redo, stage3
    )

    # 4/5. reverse + best match
    reversed_scores = cached(
        out("match_scores_reverse.json"), args.redo,
        lambda: db.reverse_match_scores(match_scores),
    )
    best = cached(
        out("best_match_scores.json"), args.redo,
        lambda: db.best_match_scores(reversed_scores),
    )

    # 6. content-hash dedup
    def stage6():
        from glob import glob

        paths = sorted(
            glob(args.dataset_dir + "/**/*" + args.extension, recursive=True)
        )
        assert paths, f"no files under {args.dataset_dir}"
        if args.n_workers > 1:
            with ProcessPoolExecutor(max_workers=args.n_workers) as ex:
                hashes = list(ex.map(db.pianoroll_content_hash, paths))
        else:
            hashes = list(map(db.pianoroll_content_hash, paths))
        return {
            os.path.basename(p)[: -len(args.extension)]: h
            for p, h in sorted(zip(paths, hashes))
        }

    file_to_hash = cached(out("hashes.json"), args.redo, stage6)
    uniq = cached(
        out("unique_files.json"), args.redo,
        lambda: sorted(
            db.unique_files(file_to_hash, {k: tuple(v) for k, v in best.items()})
        ),
    )
    matched_unique = cached(
        out("midis_matched_unique.json"), args.redo,
        lambda: sorted(set(reversed_scores).intersection(uniq)),
    )
    cached(
        out("midis_unmatched_unique.json"), args.redo,
        lambda: sorted(set(uniq) - set(matched_unique)),
    )

    # file -> spotify features for matched uniques
    def stage6b():
        result = {}
        for f_ in matched_unique:
            track_id, score = best[f_]
            sample = {"track_id": track_id, "match_score": score}
            sample.update(trackid_to_features.get(track_id, {}))
            result[f_] = sample
        return result

    file_to_spotify = cached(out("spotify_features.json"), args.redo, stage6b)

    # 7. low-level features
    def stage7():
        tasks = [(f_, args.dataset_dir, args.extension) for f_ in uniq]
        if args.n_workers > 1:
            with ProcessPoolExecutor(max_workers=args.n_workers) as ex:
                return dict(ex.map(_feat_task, tasks))
        return dict(map(_feat_task, tasks))

    midi_feats = cached(out("midi_features.json"), args.redo, stage7)

    # 8. merge
    def stage8():
        return {
            f_: {
                "midi_features": midi_feats[f_],
                "matched_features": file_to_spotify.get(f_, {}),
            }
            for f_ in midi_feats
        }

    merged = cached(out("full_dataset_features.json"), args.redo, stage8)

    # 9. summarize
    rows = db.summarize(merged)
    db.write_summary_csv(rows, out("full_dataset_features_summarized.csv"))
    print(f"Final CSV: {out('full_dataset_features_summarized.csv')}")


if __name__ == "__main__":
    main()
