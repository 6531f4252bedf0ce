"""Map profiler op names (fusion.NNN / sort.NNN) to source metadata.

Rebuilds tpu_probe's exact step_loop so the persistent compilation cache
hits, then prints each requested op's root metadata (op_name + source
line) from the compiled HLO text.

Usage: python scripts/hlo_names.py fusion.446 sort.573 ...
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    names = sys.argv[1:]
    forward_only = "--forward" in names
    names = [n for n in names if n != "--forward"]
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.core.sh import sh0_to_rgb
    from collab_splats_tpu.data.synthetic import (
        orbit_cameras, random_gaussian_params,
    )
    from collab_splats_tpu.ops.rasterize import render_tiled

    n, width, height, reps = 1_000_000, 1280, 720, 10
    params = random_gaussian_params(jax.random.PRNGKey(0), n, extent=1.5,
                                    scale_range=(0.002, 0.006))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]
    m = params["means"]; q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])
    opts = RenderOptions(rasterize_mode="antialiased",
                         max_intersections=1 << 21, tile_capacity=512,
                         backend="xla", exact_binning=False)

    def render_sum(m, q, s, o, c):
        out, _ = render_tiled(m, q, s, o, c, camera, opts)
        return (jnp.sum(out.color) + jnp.sum(out.alpha) + jnp.sum(out.depth)
                + jnp.sum(out.median_depth) + jnp.sum(out.normal))

    @jax.jit
    def step_loop(m, q, s, o, c):
        def body(i, acc):
            g = jax.grad(render_sum, argnums=(0, 2, 3, 4))(
                jnp.roll(m, i, axis=0), q, s, o, c)
            return acc + g[0][0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    @jax.jit
    def fwd_loop(m, q, s, o, c):
        def body(i, acc):
            return acc + render_sum(jnp.roll(m, i, axis=0), q, s, o, c)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    loop = fwd_loop if forward_only else step_loop
    txt = loop.lower(m, q, s, o, c).compile().as_text()
    print(f"compiled HLO: {len(txt)} chars", file=sys.stderr)
    # Index: for each fusion/sort computation, find its definition line and
    # any metadata on it; for fusions also print the fused computation's
    # biggest-shape ops' metadata.
    lines = txt.splitlines()
    for want in names:
        pat = re.compile(r"%?" + re.escape(want) + r"\b[^=]*=")
        hits = [i for i, ln in enumerate(lines) if pat.search(ln)]
        shown = 0
        for i in hits:
            ln = lines[i].strip()
            md = re.search(r'metadata=\{([^}]*)\}', ln)
            head = ln.split("=", 1)[0].strip()
            body = ln[:300]
            print(f"\n### {want} @ line {i}: {head}")
            if md:
                print(f"  metadata: {md.group(1)[:300]}")
            else:
                print(f"  {body}")
            # If it's a fusion call, find the computation name it calls.
            cm = re.search(r"calls=([%\w.\-]+)", ln)
            if cm:
                comp = cm.group(1).lstrip("%")
                # print metadata of ops inside that computation
                in_comp = False
                metas = []
                for j, l2 in enumerate(lines):
                    if re.match(r"\s*%?" + re.escape(comp) + r"\s*[({]", l2) \
                       or l2.startswith(comp + " ") \
                       or re.match(r"%?" + re.escape(comp) + r"\b", l2.strip()):
                        in_comp = True
                        continue
                    if in_comp:
                        if l2.startswith("}") or re.match(r"^\S", l2) and "{" not in l2:
                            break
                        md2 = re.search(r'metadata=\{([^}]*)\}', l2)
                        if md2:
                            op = l2.strip().split("=", 1)[0][-60:]
                            metas.append((op, md2.group(1)[:200]))
                for op, meta in metas[:8]:
                    print(f"    {op} :: {meta}")
            shown += 1
            if shown >= 2:
                break
        if not shown:
            print(f"\n### {want}: not found")


if __name__ == "__main__":
    main()
