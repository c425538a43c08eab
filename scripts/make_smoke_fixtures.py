"""Generate synthetic smoke fixtures for the four protocol scripts.

Writes, under a target dir (default /tmp/mmduet_smoke):
    videos/clip{0,1}.mp4         — tiny synthetic mp4s (cv2 VideoWriter)
    youcook2.json                — DVC-style eval annos (question_id/video/
                                   conversation + gold `answer` segments)
    magqa.json                   — MAGQA-style annos (timed user turn +
                                   timespanned gold answers)
    charades.json                — grounding annos (query + `timestamps`)
    qvh.json / qvh_gold.jsonl    — QVH eval annos + official-format gold

Usage:  python scripts/make_smoke_fixtures.py [out_dir]
Then:   TINY_RANDOM=1 OUTPUT_DIR=/tmp/smoke_out \
          INPUT_DIR=<out_dir>/videos TEST_FNAME=<out_dir>/youcook2.json \
          bash scripts/eval_youcook2.sh
"""

import json
import os
import sys

import zlib

import numpy as np


def write_video(path: str, seconds: int = 8, fps: int = 10, w: int = 64, h: int = 48):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert writer.isOpened(), f"VideoWriter failed for {path}"
    # crc32, not hash(): str hashing is salted per process and
    # would make fixture pixels differ run to run
    r = np.random.RandomState(zlib.crc32(path.encode()) % 2**31)
    for i in range(seconds * fps):
        frame = r.randint(0, 255, (h, w, 3), np.uint8)
        writer.write(frame)
    writer.release()


def main(out_dir: str = "/tmp/mmduet_smoke"):
    os.makedirs(os.path.join(out_dir, "videos"), exist_ok=True)
    vids = []
    for i in range(2):
        name = f"clip{i}.mp4"
        write_video(os.path.join(out_dir, "videos", name))
        vids.append(name)

    def q(i, video, conversation, **extra):
        return {"question_id": f"q{i}", "video": video,
                "conversation": conversation, **extra}

    youcook2 = [
        q(i, v,
          [{"role": "user", "content": "Please concisely narrate the video in real time.", "time": 0}],
          answer=[
              {"content": "The first step happens.", "time": [0.0, 3.0]},
              {"content": "The second step happens.", "time": [3.0, 7.0]},
          ])
        for i, v in enumerate(vids)
    ]
    magqa = [
        q(i, v,
          [{"role": "user", "content": "What is happening?", "time": 1.0}],
          answer=[{"content": "Something moves.", "time": [1.0, 4.0]}])
        for i, v in enumerate(vids)
    ]
    charades = [
        q(i, v,
          [{"role": "user", "content": "a person moves around", "time": 0}],
          timestamps=[[2.0, 5.0]], duration=8.0)
        for i, v in enumerate(vids)
    ]
    qvh = [
        q(i, v,
          [{"role": "user", "content": "interesting moments", "time": 0}],
          duration=8.0)
        for i, v in enumerate(vids)
    ]
    qvh_gold = [
        {"qid": f"q{i}", "duration": 8.0, "relevant_clip_ids": [1, 2],
         "saliency_scores": [[2, 3, 2], [4, 3, 4]]}
        for i in range(2)
    ]

    for name, obj in (
        ("youcook2.json", youcook2), ("magqa.json", magqa),
        ("charades.json", charades), ("qvh.json", qvh),
    ):
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(obj, f, indent=1)
    with open(os.path.join(out_dir, "qvh_gold.jsonl"), "w") as f:
        for line in qvh_gold:
            f.write(json.dumps(line) + "\n")

    write_train_fixtures(out_dir, vids)
    print(f"fixtures written to {out_dir}")


def write_train_fixtures(out_dir: str, vids):
    """TRAINING annos for all three dataset classes + a mixture config
    (same shapes as the reference mixture `configs/datasets/mmduetit.json`
    entries) — the sustained-training smoke target consumes these."""
    # DVC train annos: {video: {group_id: [{text, time, timespan}]}}
    dvc = {
        v: {
            f"g{i}": [
                {"text": "the first step happens", "time": 2.0,
                 "timespan": [0.0, 2.0]},
                {"text": "the second step happens", "time": 5.0,
                 "timespan": [2.0, 5.0]},
            ]
        }
        for i, v in enumerate(vids)
    }
    # MAGQA train annos: [{video_uid, conversation(timed turns+timespans)}]
    magqa = [
        {"video_uid": v,
         "conversation": [
             {"role": "user", "content": f"what is happening in part {j}?",
              "time": 1.0 + j},
             {"role": "assistant", "content": "something moves",
              "time": 3.0 + j, "timespan": [1.0 + j, 3.0 + j]},
         ]}
        for v in vids for j in range(2)
    ]
    # grounding train annos: [{video_uid, query, timestamps}]
    grounding = [
        {"video_uid": v, "query": f"the moment number {j}",
         "timestamps": [[1.0 + j, 4.0 + j]]}
        for v in vids for j in range(2)
    ]
    for name, obj in (("dvc_train.json", dvc), ("magqa_train.json", magqa),
                      ("grounding_train.json", grounding)):
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(obj, f, indent=1)
    mixture = [
        {"dataset_cls": "DenseVideoCaptioningStreamDataset",
         "video_root": os.path.join(out_dir, "videos"),
         "anno_file": os.path.join(out_dir, "dvc_train.json"),
         "metadata_path": os.path.join(out_dir, "videos_metadata.json")},
        {"dataset_cls": "MAGQAStreamDataset",
         "video_root": os.path.join(out_dir, "videos"),
         "anno_file": os.path.join(out_dir, "magqa_train.json"),
         "metadata_path": os.path.join(out_dir, "videos_metadata.json")},
        {"dataset_cls": "GroundingStreamDataset",
         "video_root": os.path.join(out_dir, "videos"),
         "anno_file": os.path.join(out_dir, "grounding_train.json"),
         "metadata_path": os.path.join(out_dir, "videos_metadata.json")},
    ]
    with open(os.path.join(out_dir, "train_mixture.json"), "w") as f:
        json.dump(mixture, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
