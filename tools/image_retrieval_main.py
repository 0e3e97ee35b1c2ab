"""Sentence-to-graph retrieval entry point (reference
tools/image_retrieval_main.py:1-321).

Trains the SGEncode graph encoder with the triplet margin loss over matched
(image scene graph, caption scene graph) pairs and reports txt→img
recall@K.  Input is a JSON file of records
``{"img": {"entities": [...], "relations": [[h, t, p], ...]},
   "txt": {...}}`` — the reference's caption→graph preprocessing
(image_retrieval/preprocessing.py) produces this from COCO captions; run
hermetically on a synthetic corpus when ``--data`` is omitted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def pad_graph(entities, relations, e_max, r_max):
    from veto_tpu.retrieval.model import Graph

    e = np.zeros(e_max, np.int32)
    em = np.zeros(e_max, bool)
    r = np.zeros((r_max, 3), np.int32)
    rm = np.zeros(r_max, bool)
    ne = min(len(entities), e_max)
    e[:ne] = entities[:ne]
    em[:ne] = True
    nr = min(len(relations), r_max)
    if nr:
        r[:nr] = np.asarray(relations[:nr])
        rm[:nr] = True
    return e, em, r, rm


def load_pairs(path, e_max, r_max):
    with open(path) as f:
        records = json.load(f)
    img, txt = [], []
    for rec in records:
        img.append(pad_graph(rec["img"]["entities"], rec["img"]["relations"], e_max, r_max))
        txt.append(pad_graph(rec["txt"]["entities"], rec["txt"]["relations"], e_max, r_max))
    return img, txt


def synthetic_pairs(n, e_max, r_max, img_obj, txt_obj, img_rel, txt_rel, seed=0):
    """Correlated synthetic graphs: txt ids are a fixed remap of img ids."""
    rng = np.random.RandomState(seed)
    img, txt = [], []
    obj_map = rng.permutation(txt_obj)[:img_obj]
    rel_map = rng.permutation(txt_rel)[:img_rel]
    for _ in range(n):
        ne = rng.randint(3, e_max)
        ents = rng.randint(1, img_obj, ne)
        nr = rng.randint(1, min(r_max, ne * 2))
        rels = np.stack(
            [rng.randint(0, ne, nr), rng.randint(0, ne, nr),
             rng.randint(1, img_rel, nr)], -1,
        )
        img.append(pad_graph(ents, rels, e_max, r_max))
        t_rels = rels.copy()
        t_rels[:, 2] = rel_map[rels[:, 2]]
        txt.append(pad_graph(obj_map[ents], t_rels, e_max, r_max))
    return img, txt


def stack_graphs(graphs, idx):
    from veto_tpu.retrieval.model import Graph

    sel = [graphs[i] for i in idx]
    return Graph(
        entities=jnp.asarray(np.stack([g[0] for g in sel])),
        ent_mask=jnp.asarray(np.stack([g[1] for g in sel])),
        relations=jnp.asarray(np.stack([g[2] for g in sel])),
        rel_mask=jnp.asarray(np.stack([g[3] for g in sel])),
    )


def preprocess(args):
    """Caption-graph ↔ detected-graph pair construction (reference
    image_retrieval/preprocessing.py, paths made explicit).  Consumes the
    causal-TDE ``vg_capgraphs_anno.json``, ``VG-SGG-dicts-with-attri.json``
    and the sgdet predictions dumped by
    ``relation_test_net.py --save-retrieval-predictions`` (or the VG h5
    for the ground-truth variant), writes the training pair JSON."""
    from veto_tpu.retrieval.preprocessing import (
        build_vocabs,
        generate_detect_sg,
        generate_gt_sg,
        generate_txt_img_sg,
        pairs_records,
    )

    cap_graph = json.load(open(args.capgraph))
    vg_dict = json.load(open(args.vg_dict))
    vocabs = build_vocabs(cap_graph, vg_dict)
    if args.gt_h5:
        import h5py

        with h5py.File(args.gt_h5, "r") as h5:
            img_sg = generate_gt_sg(cap_graph, vg_dict, h5)
    else:
        predictions = [
            json.loads(line)
            for line in open(args.predictions)
            if line.strip()
        ]
        img_sg = generate_detect_sg(
            predictions, cap_graph, vg_dict, obj_thres=args.obj_thres)
    txt_img_sg = generate_txt_img_sg(img_sg, cap_graph, vocabs)
    records = pairs_records(txt_img_sg)
    with open(args.out, "w") as f:
        json.dump(records, f)
    print(f"{len(records)} pairs -> {args.out}  (vocab {vocabs.sizes})")


def main():
    parser = argparse.ArgumentParser(description="VETO-TPU graph retrieval")
    parser.add_argument("--data", default=None, help="JSON pair file")
    # --- preprocessing mode (reference preprocessing.py)
    parser.add_argument("--preprocess", action="store_true",
                        help="build the pair JSON instead of training")
    parser.add_argument("--capgraph", default=None,
                        help="vg_capgraphs_anno.json")
    parser.add_argument("--vg-dict", default=None,
                        help="VG-SGG-dicts-with-attri.json")
    parser.add_argument("--predictions", default=None,
                        help="retrieval_predictions.jsonl from relation_test_net")
    parser.add_argument("--gt-h5", default=None,
                        help="VG-SGG-with-attri.h5 for the GT-graph variant")
    parser.add_argument("--obj-thres", type=float, default=0.1)
    parser.add_argument("--out", default="retrieval_pairs.json")
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--e-max", type=int, default=24)
    parser.add_argument("--r-max", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--output", default="./output_retrieval")
    parser.add_argument(
        "--model-version", default="v2", choices=["v1", "v2"],
        help="v2 = modelv2.py SGEncode (what the reference tool runs); "
             "v1 = model.py fc-fusion/BiAttention variant "
             "(retrieval/model_v1.py)")
    args = parser.parse_args()

    if args.preprocess:
        preprocess(args)
        return

    from veto_tpu.retrieval.model import SGEncode, retrieval_recall, triplet_loss
    if args.model_version == "v1":
        from veto_tpu.retrieval.model_v1 import SGEncodeV1 as SGEncode  # noqa: F811
    from veto_tpu.utils.logger import setup_logger

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logger("veto_tpu.retrieval", args.output)

    img_vocab = (151, 51)
    txt_vocab = (4460, 646)
    if args.data:
        img, txt = load_pairs(args.data, args.e_max, args.r_max)
    else:
        img, txt = synthetic_pairs(
            64, args.e_max, args.r_max, img_vocab[0], txt_vocab[0],
            img_vocab[1], txt_vocab[1],
        )
    n = len(img)
    logger.info(f"{n} graph pairs")

    model = SGEncode()
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    g0 = stack_graphs(img, [0])
    params = {}
    params = model.init(key, g0, True)["params"]
    # text vocab tables init on first txt call — merge both inits
    params_txt = model.init(key, stack_graphs(txt, [0]), False)["params"]
    params = {**params_txt, **params}
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, fg_i, fg_t, bg_i, bg_t):
        def loss_fn(p):
            ei = model.apply({"params": p}, fg_i, True)
            et = model.apply({"params": p}, fg_t, False)
            bi = model.apply({"params": p}, bg_i, True)
            bt = model.apply({"params": p}, bg_t, False)
            return triplet_loss(ei, et, bi, bt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(args.iters):
        fg = rng.choice(n, args.batch, replace=False)
        bg = rng.choice(n, args.batch, replace=False)
        params, opt_state, loss = step(
            params, opt_state,
            stack_graphs(img, fg), stack_graphs(txt, fg),
            stack_graphs(img, bg), stack_graphs(txt, bg),
        )
        if it % 50 == 0:
            logger.info(f"iter {it}: loss {float(loss):.4f}")

    encode_img = jax.jit(lambda p, g: model.apply({"params": p}, g, True))
    encode_txt = jax.jit(lambda p, g: model.apply({"params": p}, g, False))

    all_idx = list(range(n))
    img_enc = np.asarray(encode_img(params, stack_graphs(img, all_idx)))
    txt_enc = np.asarray(encode_txt(params, stack_graphs(txt, all_idx)))
    rec = retrieval_recall(img_enc, txt_enc)
    for k, v in rec.items():
        logger.info(f"Recall @ {k}: {v:.4f}")


if __name__ == "__main__":
    main()
