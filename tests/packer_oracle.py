"""Straight-line transcription oracle of the reference dataset packer.

Reproduces the observable behavior of the reference's
`lib/prep_data.py` (pack_unposed_datadict :33-90, save_all :93-106,
create_dataset :113-167) as one deliberately naive function, for
byte-parity testing of `cape_tpu/data/packer.py` — the same pattern
`tests/reference_oracle.py` uses to anchor the model. Semantics kept
bit-for-bit:

* frames sliced `[cut_first : -cut_first : sample_rate]` per sequence;
* only `np.load` guarded — an unreadable file is logged to
  broken_frames and skipped;
* rotations via `cv2.Rodrigues` per joint (always float64), raveled to
  one [J*9] row per frame;
* disp/pose/clo_label pass the raw dtypes through (`clo` one-hot is
  platform int);
* a non-empty sequence directory bumps the per-clotype SEQUENCE counter
  (substring match against the cloth name) even if every frame is
  broken; an empty directory bumps nothing and logs nothing;
* stats.txt: header, per-sequence info lines, a blank-prefixed
  "Total sequences: {dict} " line, per-clotype frame totals, example
  total — train truncates ('w+'), test appends ('a+');
* broken_frames.txt: header + "Broken frames that are not packed:" +
  one absolute path per line, same file modes.
"""

from __future__ import annotations

import os
from glob import glob

import cv2
import numpy as np

CLO_TYPES = ["shortlong", "shortshort", "longshort", "longlong"]


def oracle_create_dataset(
    phase: str, split: dict, cape_ds_dir: str, ds_name: str, out_root: str
) -> int:
    vdisps, poses, rots, labels = [], [], [], []
    info_lines, broken = [], []
    seq_counter = {c: 0 for c in CLO_TYPES}

    for subj in split[f"{phase}_subjs"]:
        for seq in split[f"{phase}_seqs"]:
            for cloth in split[f"{phase}_cloth"]:
                if seq in split["exclude_seqs"]:
                    continue
                if [subj, cloth] in split["exclude_cases"]:
                    continue
                seq_dir = os.path.join(
                    cape_ds_dir, "sequences", subj, cloth + "_" + seq
                )
                if not os.path.exists(seq_dir):
                    continue
                files = sorted(glob(os.path.join(seq_dir, "*.npz")))
                if len(files) == 0:
                    continue
                minimal = np.load(
                    os.path.join(
                        cape_ds_dir,
                        "minimal_body_shape",
                        subj,
                        subj + "_minimal.npy",
                    )
                )
                files = files[
                    split["cut_first"] : -split["cut_first"] : split["sample_rate"]
                ]
                added = 0
                for fname in files:
                    try:
                        frame = np.load(fname)
                    except Exception:
                        broken.append(fname)
                        continue
                    pose = frame["pose"]
                    aa = pose.reshape(-1, 3)
                    rot = np.array(
                        [cv2.Rodrigues(aa[j, :])[0] for j in range(aa.shape[0])]
                    ).ravel()
                    vdisps.append(frame["v_cano"] - minimal)
                    poses.append(pose)
                    rots.append(rot)
                    labels.append((np.array(CLO_TYPES) == cloth).astype(int))
                    added += 1
                info_lines.append(
                    "{} - {}: {} {} {}, {} frames\n".format(
                        len(vdisps) - added + 1, len(vdisps), subj, seq, cloth, added
                    )
                )
                for c in seq_counter:
                    seq_counter[c] += int(c in cloth)

    if len(vdisps) == 0:
        return 0

    out_dir = os.path.join(out_root, ds_name, phase)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{phase}_disp.npy"), np.array(vdisps))
    np.save(os.path.join(out_dir, f"{phase}_pose.npy"), np.array(poses))
    np.save(os.path.join(out_dir, f"{phase}_rot.npy"), np.array(rots))
    np.save(os.path.join(out_dir, f"{phase}_clo_label.npy"), np.array(labels))

    clo = np.array(labels)
    per_type = [int((clo[:, i] == 1).sum()) for i in range(4)]
    mode = "w+" if phase == "train" else "a+"
    with open(os.path.join(out_root, ds_name, "stats.txt"), mode) as f:
        f.write("-----------{} SET-----------\n".format(phase.upper()))
        for line in info_lines:
            f.write(line)
        f.write("\nTotal sequences: {} \n".format(seq_counter))
        f.write(
            "Total: {} shortlong, {} shortshort, {} longshort, {} longlong\n".format(
                *per_type
            )
        )
        f.write("Total: {} {} examples\n\n".format(len(vdisps), phase))
    with open(os.path.join(out_root, ds_name, "broken_frames.txt"), mode) as f:
        f.write("-----------{} SET-----------\n".format(phase.upper()))
        f.write("Broken frames that are not packed:\n")
        for b in broken:
            f.write("{}\n".format(b))
    return len(vdisps)
