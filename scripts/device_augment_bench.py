"""Device-side augmentation throughput (data/device_augment.py).

The point of --device_augment is host relief: the chip absorbs the
augment + normalize stage so the host only decodes+resizes uint8. This
measures what that costs ON the chip — the augment fn standalone (is it
negligible next to the ~57 fps teacher / 17k fps student steps?) and the
uint8 vs f32 transfer sizes it saves.

Run (TPU): python scripts/device_augment_bench.py [--nano]
  --nano: tiny shapes on CPU, plumbing check only
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scripts.swin_roofline import timed_scan


def main():
    nano = "--nano" in sys.argv
    b, h, w = (8, 32, 56) if nano else (128, 256, 448)
    from computervision_codes_tpu.data.device_augment import (
        make_device_augment,
    )

    # feed f32 and cast to uint8 INSIDE the timed fn: timed_scan's
    # anti-hoisting eps (~1e-3) is a no-op on a uint8 arg (astype rounds
    # it to 0 -> loop-invariant input -> XLA hoists the whole augment out
    # of the scan and the timing is bogus)
    x = jax.random.randint(jax.random.PRNGKey(0), (b, h, w, 3), 0, 256,
                           jnp.int32).astype(jnp.float32)
    key = jax.random.PRNGKey(1)

    for augs, label, rot in (
            (("original",), "normalize only", "two_pass"),
            (("vflip", "hflip"), "flips", "two_pass"),
            (("vflip", "hflip", "contrast"), "flips+autocontrast",
             "two_pass"),
            (("original", "vflip", "hflip", "contrast", "rot90"),
             "reference default list (gather rot)", "gather"),
            (("original", "vflip", "hflip", "contrast", "rot90"),
             "reference default list (two-pass rot)", "two_pass"),
            (("rot90",), "rot90 two-pass alone", "two_pass"),
    ):
        fn = make_device_augment(augs, rot_impl=rot)
        s = timed_scan(lambda x: fn(
            key, x.astype(jnp.uint8)).astype(jnp.float32).mean(), (x,))
        fps = b / s
        print(json.dumps({"row": f"device_augment {label}",
                          "batch": b, "sec_per_batch": round(s, 6),
                          "frames_per_sec": round(fps, 1)}))


if __name__ == "__main__":
    main()
