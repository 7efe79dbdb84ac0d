"""Image-set similarity between foreign/English MMID word folders via CNN
global embeddings, avg-max-cosine (reference mmid/mmid_sim.py:93-178).

TPU-native: images embed through the flax ResNetGrid (mean-pooled grid ->
one L2-normalized vector per image) in jitted batches; the pairwise cosine
block is a single matmul per folder pair.

--foreign dir-of-word-dirs, --en dir-of-letter-dirs/word-dirs,
--output TSV "foreign_dir\ten_dir\tavg_max_cos", --max-img per folder.
"""
import argparse
import os

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--foreign", dest="foreign_folder", required=True)
    p.add_argument("--en", dest="en_folder", required=True)
    p.add_argument("--output", dest="output_file", required=True)
    p.add_argument("--max-img", type=int, default=10)
    p.add_argument("--depth", type=int, default=1)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagetranslate_tpu.data.images import load_image
    from imagetranslate_tpu.models.resnet import ResNetGrid

    model = ResNetGrid(embed_dim=512, depth=a.depth, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))

    @jax.jit
    def embed(images):
        grid = model.apply(params, images)          # [B, 49, E]
        vec = jnp.mean(grid, axis=1)                 # global embedding
        return vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-4)

    def folder_vectors(folder):
        paths = [os.path.join(folder, f) for f in sorted(os.listdir(folder))
                 if f.lower().endswith((".jpg", ".jpeg"))][:a.max_img]
        if not paths:
            return None
        batch = np.stack([load_image(p) for p in paths])
        # pad to a fixed batch for stable shapes
        pad = a.max_img - len(batch)
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                    np.float32)])
        vecs = np.asarray(embed(jnp.asarray(batch)))
        return vecs[:len(paths)]

    foreign = []
    for name in sorted(os.listdir(a.foreign_folder)):
        d = os.path.join(a.foreign_folder, name)
        if not os.path.isdir(d):
            continue
        v = folder_vectors(d)
        if v is not None:
            foreign.append((d, v))
    print(f"{len(foreign)} foreign folders embedded")

    with open(a.output_file, "w") as w:
        for en_group in sorted(os.listdir(a.en_folder)):
            group_dir = os.path.join(a.en_folder, en_group)
            if not os.path.isdir(group_dir):
                continue
            subdirs = [os.path.join(group_dir, s)
                       for s in sorted(os.listdir(group_dir))]
            subdirs = [s for s in subdirs if os.path.isdir(s)] or [group_dir]
            for en_dir in subdirs:
                ev = folder_vectors(en_dir)
                if ev is None:
                    continue
                for f_dir, fv in foreign:
                    cos = fv @ ev.T
                    avg_max = float(cos.max(axis=1).mean())
                    w.write(f_dir + "\t" + en_dir + "\t" + str(avg_max)
                            + "\n")
    print("Finished")

if __name__ == "__main__":
    main()
