"""AOT compile-check the SHARDED mosaic programs at north-star scale
for an 8-device v5e topology (VERDICT r3 item 3a).

The v5e-8 north-star claim rests on the sharded ``mosaic_pipeline``
fitting per-chip HBM at 10000x10000 x8-band. This tool lowers and
compiles every device stage of that pipeline from ShapeDtypeStructs —
no scene, no upload, no execution — and prints XLA's per-stage memory
analysis.

Two modes:

1. **topology** — ``jax.experimental.topologies`` provides a detached
   v5e 2x4 device set; every stage compiles against the REAL 8-chip
   topology (collectives and all). Requires a backend that exposes
   PJRT topology descriptions.
2. **shard-local fallback** (``--shard-local``, automatic when mode 1
   fails) — each stage compiles on the single attached chip over a 1x1
   mesh at the 2x4 SHARD shapes (5000x2500 per chip). This bounds the
   dominant per-chip footprint (the sharded operands and their
   shard-local temporaries); the collective buffers it cannot see are
   K-sized (MBs), except the GLCM (K, levels^2) histogram psum which is
   counted in that stage's own temp report anyway.

Run as the ONLY TPU client (concurrent axon clients serialize):

    python tools/compile_check_v5e8.py              # 10000x10000 x8
    python tools/compile_check_v5e8.py 12000 12000 8
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _fmt(n):
    return "?" if n is None else f"{n / (1 << 30):.2f} GiB"


def check(name, fn, *args):
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        mem = None
        try:
            mem = compiled.memory_analysis()
        except Exception:
            pass
        if mem is not None:
            print(f"PASS {name}: temp={_fmt(getattr(mem, 'temp_size_in_bytes', None))} "
                  f"args={_fmt(getattr(mem, 'argument_size_in_bytes', None))} "
                  f"out={_fmt(getattr(mem, 'output_size_in_bytes', None))}")
        else:
            print(f"PASS {name}")
        return True
    except (TypeError, AttributeError):
        raise  # tool-side breakage, not a compiler verdict
    except Exception as e:
        first = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"FAIL {name}: {first}")
        return False


def _topology_mesh(ty: int, tx: int):
    """A detached v5e ty*tx topology mesh, or None with the reason."""
    import jax

    try:
        from jax.experimental import topologies
    except Exception as e:  # pragma: no cover
        return None, f"jax.experimental.topologies unavailable: {e}"
    for spec in (f"v5e:{ty}x{tx}", f"v5litepod-{ty * tx}", f"v5e-{ty * tx}"):
        try:
            topo = topologies.get_topology_desc(platform="tpu",
                                                topology_name=spec)
            devs = np.asarray(topo.devices).reshape(ty, tx)
            return jax.sharding.Mesh(devs, ("ty", "tx")), None
        except Exception as e:
            err = f"{spec}: {str(e).splitlines()[0][:150]}"
    return None, err


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10000
    W = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 10000
    C = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 8
    force_local = "--shard-local" in sys.argv
    TY, TX = 2, 4
    n_segments = 3000

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from obia_tpu.ops.stats import pad_num_segments
    from obia_tpu.parallel import sharded as S

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("refusing to run on the CPU backend: per-chip HBM limits "
              "are what this tool checks", file=sys.stderr)
        sys.exit(2)

    mesh = None
    if not force_local:
        mesh, why = _topology_mesh(TY, TX)
        if mesh is None:
            print(f"topology mode unavailable ({why}); "
                  "falling back to shard-local compiles")
    if mesh is not None:
        mode = "topology"
        Hc, Wc = H, W
        ty, tx = TY, TX
    else:
        mode = "shard-local"
        # one shard of the 2x4 layout on the attached chip via a 1x1 mesh
        Hc, Wc = H // TY, W // TX
        ty, tx = 1, 1
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:1]).reshape(1, 1), ("ty", "tx"))
    print(f"mode={mode} scene={H}x{W}x{C} compile-shape={Hc}x{Wc} "
          f"mesh={ty}x{tx}")

    K_pad = pad_num_segments(n_segments)
    f32 = jnp.float32
    sh_img = NamedSharding(mesh, P("ty", "tx", None))
    sh_lab = NamedSharding(mesh, P("ty", "tx"))
    img = jax.ShapeDtypeStruct((Hc, Wc, C), f32, sharding=sh_img)
    lab = jax.ShapeDtypeStruct((Hc, Wc), jnp.int32, sharding=sh_lab)

    failures = 0
    n = 0

    def counted(name, fn, *args):
        nonlocal failures, n
        n += 1
        failures += not check(name, fn, *args)

    # 1. sharded SLIC k-means (10 iterations + final assign)
    counted("sharded_slic_assign",
            lambda im: S.sharded_slic_assign(mesh, im, n_segments,
                                             compactness=10.0,
                                             max_num_iter=10), img)

    # 2. per-shard scan-CCL + strips (the device stage of ccl_merge)
    n_shards = ty * tx
    k_max = max(512, n_segments * 4 // max(TY * TX, 1) + 512)
    run_ccl, _ = S._local_ccl_factory(mesh, Hc, Wc, (Hc, Wc), k_max)
    counted("sharded_ccl_local", run_ccl, lab)

    # 3. LUT relabel (gather over the replicated final LUT)
    lut = jax.ShapeDtypeStruct((n_shards * k_max,), jnp.int32)
    counted("apply_lut", S._apply_lut, lab, lut)

    # 4. merge device stage: sizes + per-shard edges + seam strips
    counted("sharded_merge_edges", S._merge_edges_factory(mesh, K_pad), lab)

    # 5. the replicated edge-domain sweep loop at the concatenated width
    from obia_tpu.ops.connectivity import merge_lut_from_edges
    E = 4 * K_pad * n_shards + 2 * (Wc * (TY - 1) + Hc * (TX - 1))
    ea = jax.ShapeDtypeStruct((E,), jnp.int32)
    sizes = jax.ShapeDtypeStruct((K_pad,), f32)
    counted("merge_lut_from_edges",
            lambda a, b, s: merge_lut_from_edges(
                a, b, s, jnp.float32(16), jnp.float32(10000), K_pad),
            ea, ea, sizes)

    # 5b. the dust-regime sharded merge at the north-star's raw-CCL K
    # (5.5 M fragments, 30.1 M boundary pairs — probe_ccl_merge.py): the
    # REAL merge shapes of the 100 MP run, not the object-scale K_pad
    from obia_tpu.parallel.sharded import (_dust_phase_a_factory,
                                           _apply_lut as _alut)
    from obia_tpu.ops.connectivity import (_MERGE_HEAD_SWEEPS,
                                           _merge_final_lut,
                                           _merge_phase_b_lut)
    K_dust = pad_num_segments(5_500_000)
    n_shards = ty * tx
    cap_shard = -(-(30_100_000 // (TY * TX)) // (1 << 16)) * (1 << 16)
    scal = jax.ShapeDtypeStruct((), f32)
    counted("dust_phase_a",
            _dust_phase_a_factory(mesh, K_dust, cap_shard,
                                  _MERGE_HEAD_SWEEPS),
            lab, scal, scal)
    E2_shard = -(-(1_300_000 // (TY * TX)) // (1 << 14)) * (1 << 14)
    K2_dust = pad_num_segments(260_000)
    lut_s = jax.ShapeDtypeStruct((K_dust,), jnp.int32)
    sizes_s = jax.ShapeDtypeStruct((K_dust,), f32)
    e_s = jax.ShapeDtypeStruct((n_shards * cap_shard,), jnp.int32)

    def dust_phase_b(lab, lut, sizes0, ea2, eb2):
        ea_c = ea2.reshape(n_shards, cap_shard)[:, :E2_shard].reshape(-1)
        eb_c = eb2.reshape(n_shards, cap_shard)[:, :E2_shard].reshape(-1)
        lut_full = _merge_phase_b_lut(
            lut, sizes0, ea_c, eb_c, jnp.float32(170), jnp.float32(10 ** 9),
            K_dust, K2_dust, n_shards * E2_shard, 512)
        final_lut, k_dev = _merge_final_lut(lut_full, sizes0, K_dust)
        return _alut(lab, final_lut), k_dev

    counted("dust_phase_b", dust_phase_b, lab, lut_s, sizes_s, e_s, e_s)

    # 6. sharded spectral moments (full 6-stat set, packed)
    counted("sharded_spectral_moments",
            lambda im, lb: S.sharded_spectral_moments(mesh, im, lb, K_pad,
                                                      packed=True)[1],
            img, lab)

    # 7. sharded GLCM, SCATTER path (exact ASM via the psum'd joint
    # histogram). use_pallas=False pins the route: the default gate now
    # picks the Pallas path on TPU, whose host-side pre-pass/job build
    # cannot trace under this tool's jit (the Pallas program is AOT-
    # checked as its own row below). The static multi_cap stands in for
    # the pre-pass exact count — 4096 upper-bounds production
    counted("sharded_glcm_props",
            lambda im, lb: S.sharded_glcm_props(mesh, im, lb, K_pad,
                                                levels=256, packed=True,
                                                multi_cap=4096,
                                                use_pallas=False)[1],
            img, lab)

    # 8. sharded Pallas MXU GLCM (the kernel path big TPU scenes route
    # to): per-shard job lists at north-star buckets — ~26k global jobs
    # over 8 shards (8192/shard covers clipped-bbox growth), seam-spanner
    # histogram cap 512 (measured spanner counts are ~200 at 100 MP)
    from obia_tpu.ops.glcm import DEFAULT_ANGLES
    from obia_tpu.parallel.glcm_sharded import _make_program
    Jp_s, HJp_s, MCAP_s = 8192, 2048, 512
    n_shards = ty * tx
    sh_flat = NamedSharding(mesh, P(("ty", "tx")))
    sh_rep = NamedSharding(mesh, P())
    jarr = lambda m: jax.ShapeDtypeStruct((n_shards * m,), jnp.int32,
                                          sharding=sh_flat)
    glcm_pallas_run = _make_program(
        mesh, K_pad, 256, 2, DEFAULT_ANGLES, tuple(range(C)),
        MCAP_s, Jp_s, HJp_s, True, False)
    counted("sharded_glcm_pallas", glcm_pallas_run,
            img, lab, jarr(Jp_s), jarr(Jp_s), jarr(HJp_s), jarr(HJp_s),
            jarr(HJp_s), jarr(MCAP_s),
            jax.ShapeDtypeStruct((K_pad,), jnp.bool_, sharding=sh_rep),
            jax.ShapeDtypeStruct((K_pad,), jnp.int32, sharding=sh_rep))

    print(f"{n - failures}/{n} sharded programs compile [{mode}]")
    sys.exit(failures)


if __name__ == "__main__":
    main()
