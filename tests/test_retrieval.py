"""Graph-retrieval side task: encoder shapes, triplet loss, recall ranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.retrieval.model import (
    Graph,
    SGEncode,
    retrieval_recall,
    triplet_loss,
)


def _graph(rng, b=2, e=6, r=8, num_obj=20, num_rel=9):
    ents = rng.randint(1, num_obj, (b, e))
    rels = np.stack(
        [rng.randint(0, e, (b, r)), rng.randint(0, e, (b, r)),
         rng.randint(1, num_rel, (b, r))], -1,
    )
    return Graph(
        entities=jnp.asarray(ents),
        ent_mask=jnp.asarray(np.ones((b, e), bool)),
        relations=jnp.asarray(rels),
        rel_mask=jnp.asarray(np.ones((b, r), bool)),
    )


def test_sgencode_shapes(rng):
    m = SGEncode(img_num_obj=20, img_num_rel=9, txt_num_obj=30, txt_num_rel=11,
                 embed_dim=16, hidden_dim=16, final_dim=32)
    g = _graph(rng)
    v = m.init(jax.random.PRNGKey(0), g, True)
    out_img = m.apply(v, g, True)
    assert out_img.shape == (2, 32)
    v2 = m.init(jax.random.PRNGKey(0), g, False)
    out_txt = m.apply(v2, g, False)
    assert np.isfinite(np.asarray(out_txt)).all()


def test_triplet_loss_margin():
    a = jnp.zeros((2, 4))
    b = jnp.zeros((2, 4))
    far = jnp.full((2, 4), 10.0)
    # matched pair identical, backgrounds far → hinge fully satisfied, loss 0
    assert float(triplet_loss(a, b, far, far)) == pytest.approx(0.0)
    # everything identical → both hinges at the margin
    assert float(triplet_loss(a, b, a, b)) == pytest.approx(2.0)


def test_retrieval_recall_ranking():
    enc = np.eye(4, dtype=np.float32)
    rec = retrieval_recall(enc, enc, ks=(1, 2))
    assert rec[1] == 1.0
    # swap two rows of txt → those ranks fail at k=1... (similarity 0 vs diag 0
    # ties don't count as better, so recall stays 1 with strict >)
    noisy = enc.copy()
    noisy[0] = enc[1]
    noisy[1] = enc[0]
    rec2 = retrieval_recall(enc, noisy, ks=(1,))
    assert rec2[1] < 1.0


# ---------------------------------------------------------------------------
# v1 (fc-fusion) variant vs the LIVE reference model.py (VERDICT r4 #8)
# ---------------------------------------------------------------------------
def test_sgencode_v1_parity_vs_reference():
    """SGEncodeV1 with imported weights reproduces the reference v1
    SGEncode's img/txt encodings and triplet loss (model.py:138-229)."""
    import torch

    from ref_loader import load_ref_retrieval_v1, reference_available
    from veto_tpu.retrieval.model_v1 import (
        SGEncodeV1,
        retrieval_v1_param_updates,
        triplet_loss_v1,
    )
    from veto_tpu.utils.torch_import import apply_updates

    if not reference_available():
        pytest.skip("/root/reference not mounted")
    ref_mod = load_ref_retrieval_v1()
    torch.manual_seed(7)
    ref = ref_mod.SGEncode().eval()

    rng = np.random.RandomState(3)

    def make(e, r, num_obj, num_rel):
        ents = rng.randint(1, num_obj, e)
        rel_idx = np.stack([rng.randint(0, e, r), rng.randint(0, e, r),
                            rng.randint(1, num_rel, r)], -1)
        # the reference tool pre-maps head/tail indices to entity classes
        # (image_retrieval_main.py:169); the torch dict carries classes,
        # our Graph the indices
        rel_cls = rel_idx.copy()
        rel_cls[:, 0] = ents[rel_idx[:, 0]]
        rel_cls[:, 1] = ents[rel_idx[:, 1]]
        tdict = {"entities": torch.from_numpy(ents),
                 "relations": torch.from_numpy(rel_cls)}
        graph = Graph(
            entities=jnp.asarray(ents)[None],
            ent_mask=jnp.ones((1, e), bool),
            relations=jnp.asarray(rel_idx)[None],
            rel_mask=jnp.ones((1, r), bool),
        )
        return tdict, graph

    fg_img_t, fg_img = make(6, 9, 151, 51)
    bg_img_t, bg_img = make(5, 7, 151, 51)
    fg_txt_t, fg_txt = make(7, 8, 4460, 646)
    bg_txt_t, bg_txt = make(4, 6, 4460, 646)

    with torch.no_grad():
        ref_fg_img = ref.encode(fg_img_t, is_img=True).numpy()
        ref_fg_txt = ref.encode(fg_txt_t, is_txt=True).numpy()
        loss_ref = ref([fg_img_t], [fg_txt_t], [bg_img_t], [bg_txt_t])
        loss_ref = float(sum(loss_ref))

    model = SGEncodeV1()
    variables = model.init(jax.random.PRNGKey(0), fg_img, True)
    variables = model.init(jax.random.PRNGKey(0), fg_txt, False)
    # one init tracing BOTH vocabularies so the tree holds all tables
    def both(m, gi, gt):
        return m(gi, True), m(gt, False)
    variables = model.init(jax.random.PRNGKey(0), fg_img, fg_txt,
                           method=both)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, _, skipped = apply_updates(
        variables["params"], retrieval_v1_param_updates(sd))
    assert not skipped, skipped[:6]
    variables = {"params": params}

    got_fg_img = np.asarray(model.apply(variables, fg_img, True))
    got_fg_txt = np.asarray(model.apply(variables, fg_txt, False))
    np.testing.assert_allclose(got_fg_img, ref_fg_img, atol=2e-4)
    np.testing.assert_allclose(got_fg_txt, ref_fg_txt, atol=2e-4)

    enc = {
        "fg_img": got_fg_img, "fg_txt": got_fg_txt,
        "bg_img": np.asarray(model.apply(variables, bg_img, True)),
        "bg_txt": np.asarray(model.apply(variables, bg_txt, False)),
    }
    got_loss = float(triplet_loss_v1(
        jnp.asarray(enc["fg_img"]), jnp.asarray(enc["fg_txt"]),
        jnp.asarray(enc["bg_img"]), jnp.asarray(enc["bg_txt"])))
    assert got_loss == pytest.approx(loss_ref, rel=1e-4)
