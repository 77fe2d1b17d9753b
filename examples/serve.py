"""Serving example: JPEG bytes -> logits, end to end.

  python examples/serve.py image1.jpg image2.jpg ...

Host side: native multithreaded libjpeg decode + bilinear resize
(vit_tpu.data.JpegDecoder, C++ via ctypes, PIL fallback). Device side:
resize/crop/normalize fused into the same XLA program as the model
(vit_tpu.pipeline.InferencePipeline) so one dispatch serves the request.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    paths = sys.argv[1:]
    from vit_tpu.data import JpegDecoder, classify_jpegs
    from vit_tpu.models import ViT
    from vit_tpu.pipeline import InferencePipeline

    model = ViT(
        image_size=224, patch_size=16, num_classes=1000, dim=768,
        depth=12, heads=12, mlp_dim=3072, dtype=jnp.bfloat16,
    )
    img = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    variables = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, 
                                           jnp.zeros((1, 224, 224, 3), jnp.bfloat16)))()
    pipe = InferencePipeline(model, variables, image_size=224)

    if paths:
        jpegs = [open(p, "rb").read() for p in paths]
    else:
        # demo: encode one synthetic image
        from io import BytesIO

        from PIL import Image

        buf = BytesIO()
        Image.fromarray(
            (np.random.default_rng(0).random((256, 256, 3)) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        jpegs = [buf.getvalue()]
        print("(no paths given — classifying one synthetic JPEG)")

    logits = classify_jpegs(pipe, jpegs)
    for p, row in zip(paths or ["<synthetic>"], logits):
        top = np.argsort(row)[-3:][::-1]
        print(f"{p}: top-3 classes {top.tolist()}")


if __name__ == "__main__":
    main()
