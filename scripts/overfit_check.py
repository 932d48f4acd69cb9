"""Learnability validation: overfit the spatial student on 3 synthetic videos.

End-to-end training-correctness check (data feed -> model -> loss ->
optimizer -> BN stats -> eval -> per-video mAP): with augmentations off the
pipeline must memorize the train set to mAP(ivt) = 1.0.

Verified result (CPU, 25 epochs, ~3 min): final train loss 0.0018,
train-set mAP(ivt) = 1.0000. With the reference augmentations on, the same
run reaches ~0.52 — expected, because the images are random noise and the
continuous rot90 augmentation never shows the clean eval view.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/overfit_check.py
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main(epochs: int = 25) -> float:
    from computervision_codes_tpu.data.pipeline import (
        CholecDataset,
        batch_iterator,
    )
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import write_synthetic_dataset
    from computervision_codes_tpu.metrics import Recognition
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
    from computervision_codes_tpu.train import (
        build_sgd,
        create_train_state,
        make_spatial_eval_step,
        make_spatial_train_step,
    )

    split = resolve_split("cholect45-crossval", 1)
    root = tempfile.mkdtemp(prefix="overfit_")
    videos = list(split.all_videos[:3])
    write_synthetic_dataset(root, videos, frames_per_video=6, height=32,
                            width=56, seed=3)
    ds = CholecDataset(root, image_size=(32, 56),
                       augmentation_list=["original"])

    model = SpatialCNN(network="resnet18", loss_type="ivt")
    state = create_train_state(model, build_sgd(0.05, momentum=0.9),
                               jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 56, 3), jnp.float32),))
    step = make_spatial_train_step(model, loss_type="ivt")
    ev = make_spatial_eval_step(model)

    for epoch in range(epochs):
        for b in batch_iterator(ds, videos, 6, train=True, seed=epoch,
                                pad_last=True):
            jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
            state, m = step(state, jb)
    print("final train loss:", float(m["loss"]))

    rec = Recognition(100)
    for v in videos:
        for b in batch_iterator(ds, [v], 6, train=False, pad_last=True):
            probs, _ = ev(state, jnp.asarray(b["image"]))
            rec.update(b["label_ivt"][b["valid"]],
                       np.asarray(probs["ivt"])[b["valid"]])
        rec.video_end()
    m_ap = rec.compute_video_AP("ivt")["mAP"]
    print("overfit train-set mAP(ivt):", round(m_ap, 4))
    assert m_ap > 0.95, "training pipeline failed to memorize the train set"
    return m_ap


if __name__ == "__main__":
    main()
