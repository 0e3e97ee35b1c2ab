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
