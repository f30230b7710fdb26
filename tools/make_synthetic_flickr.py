"""Generate a synthetic *grounded* corpus in the Flickr30K on-disk layout
(FlickrReader + FlickrDataset contract: flickr_{split}.json, {split}.txt,
flickr.dic.json, gt_anno_test.pkl, {mode}_features_compress.hdf5,
{mode}_imgid2idx.pkl, {mode}_detection_dict.json, objects_vocab.txt --
reference layout: cliora/data/reading.py:455-528,
cliora/data/dataloader.py:188-225).

Sentences come from the same PCFG as make_synthetic_ptb; each sentence is
paired with an "image" whose regions carry 2048-d features drawn from a
per-word visual centroid (+ noise) for every noun in the sentence, plus
distractor regions of random other nouns.  Region boxes are pairwise
disjoint and each noun token's grounding GT is its own region's box, so
phrase-grounding Recall@1 is learnable (the VG loss must align
fc_vis(feature) with the word branch of the embedding) and chance level
is ~1/n_regions.  Used to demonstrate the full CLIORA visual loop:
grounding_acc rising above chance on a real TPU run (BASELINE.md).

Usage: python tools/make_synthetic_flickr.py out_dir [n_train] [n_test]
"""

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_synthetic_ptb import (  # noqa: E402
    make_vocab,
    sample_tree,
    tree_leaves,
    tree_spans,
    write_embeddings,
)

FEAT_DIM = 2048     # MAF Faster-R-CNN width (FlickrDataset default)
MAX_REGIONS = 12    # regions per image (padded to 36 by FlickrDataset)
VIS_NOISE = 0.1


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "synthetic_flickr"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    os.makedirs(out_dir, exist_ok=True)
    classes = make_vocab()
    nouns = classes["n"]

    word2idx = {"_PAD": 0, "<unk>": 1}
    for cls in classes.values():
        for word in cls:
            word2idx[word] = len(word2idx)
    with open(os.path.join(out_dir, "flickr.dic.json"), "w") as f:
        json.dump(word2idx, f)
    write_embeddings(os.path.join(out_dir, "glove.txt"), classes)

    # fixed per-noun visual centroid; scaled so features look MAF-ish
    vis_rng = np.random.RandomState(99)
    centroids = {w: vis_rng.randn(FEAT_DIM) for w in nouns}

    with open(os.path.join(out_dir, "objects_vocab.txt"), "w") as f:
        f.write("\n".join(nouns) + "\n")

    def box_of(slot):
        # pairwise-disjoint unit boxes along a row: IoU(gt, wrong) = 0
        x = 20.0 * slot
        return [x, 0.0, x + 10.0, 10.0]

    next_img_id = {"train": 10000, "test": 50000}

    def make_split(split, mode, n, seed):
        rng = np.random.RandomState(seed)
        lines, id_lines, anno = [], [], {}
        feats, bboxes, pos = [], [], []
        imgid2idx, det = {}, {}
        while len(lines) < n:
            tree = sample_tree(rng, classes)
            leaves = tree_leaves(tree)
            if not 4 <= len(leaves) <= 16:
                continue
            img_id = next_img_id[mode]
            next_img_id[mode] += 1

            # one region per noun token (first occurrence), then
            # distractors of nouns NOT in the sentence
            noun_pos = [i for i, w in enumerate(leaves) if w in centroids]
            sent_nouns = []
            for i in noun_pos:
                if leaves[i] not in sent_nouns \
                        and len(sent_nouns) < MAX_REGIONS:
                    sent_nouns.append(leaves[i])
            n_distract = min(MAX_REGIONS - len(sent_nouns),
                             rng.randint(2, 6))
            others = [w for w in nouns if w not in sent_nouns]
            region_words = sent_nouns + list(
                rng.choice(others, n_distract, replace=False))
            # shuffle slots: region order must not encode word order,
            # or the zero-init argmax-slot-0 heuristic scores above chance
            rng.shuffle(region_words)
            phrases = {
                f"phr{i}": (i, i + 1, box_of(region_words.index(leaves[i])))
                for i in noun_pos if leaves[i] in region_words
            }

            start = len(feats)
            for w in region_words:
                feats.append(centroids[w]
                             + VIS_NOISE * rng.randn(FEAT_DIM))
            bboxes += [box_of(k) for k in range(len(region_words))]
            pos.append([start, start + len(region_words)])
            imgid2idx[img_id] = len(imgid2idx)
            det[str(img_id)] = {"classes": list(region_words)}

            # gold spans: internal nodes, root LAST (eval drops gold[-1])
            gold = [(a, b) for a, b in tree_spans(tree)]
            lines.append([" ".join(leaves), gold])
            id_lines.append(f"{img_id}\t0")
            if mode == "test":
                anno[f"{img_id}_0"] = [phrases, [1, 1]]

        with open(os.path.join(out_dir, f"flickr_{split}.json"), "w") as f:
            for ln in lines:
                f.write(json.dumps(ln) + "\n")
        with open(os.path.join(out_dir, f"{split}.txt"), "w") as f:
            f.write("\n".join(id_lines) + "\n")
        if mode == "test":
            with open(os.path.join(out_dir, f"gt_anno_{split}.pkl"),
                      "wb") as f:
                pickle.dump(anno, f)

        import h5py
        with h5py.File(os.path.join(
                out_dir, f"{mode}_features_compress.hdf5"), "w") as f:
            f.create_dataset("features",
                             data=np.asarray(feats, np.float32))
            f.create_dataset("bboxes",
                             data=np.asarray(bboxes, np.float32))
            f.create_dataset("pos_bboxes", data=np.asarray(pos, np.int64))
        with open(os.path.join(out_dir, f"{mode}_imgid2idx.pkl"),
                  "wb") as f:
            pickle.dump(imgid2idx, f)
        with open(os.path.join(out_dir,
                               f"{mode}_detection_dict.json"), "w") as f:
            json.dump(det, f)
        n_phr = sum(1 for _ in anno) if mode == "test" else 0
        print(f"{split}: {len(lines)} sentences, {len(feats)} regions"
              + (f", {n_phr} grounded images" if n_phr else ""))

    make_split("train", "train", n_train, seed=21)
    make_split("test", "test", n_test, seed=22)


if __name__ == "__main__":
    main()
