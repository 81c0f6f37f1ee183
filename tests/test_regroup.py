"""Lane-regrouped wavefront tests (interpret mode on CPU).

Same load-bearing property as the row-granular wavefront: any compaction
schedule yields bit-identical pixels, because RNG streams are per
(pixel, sample, bounce) and the dense pack only changes which tile
executes a ray. Additionally the pack must be a *permutation* (counts
shrink monotonically, dense rows) and the unpack a perfect inverse.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.camera import CameraBasis
from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
from weekend_raytracer_tpu.ops.pallas.regroup import render_image_regrouped
from weekend_raytracer_tpu.ops.pallas.wavefront import render_image_wavefront

W, H = 96, 40


@pytest.fixture(scope="module")
def rtiow():
    scene = scenes.rtiow_final().build()
    basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
    return scene, to_sky_state(SkyParams()), basis


def _args(scene, sky, basis, frame=0, clear=True):
    acc = jnp.zeros((W * H, 3), jnp.float32)
    return (acc, jnp.uint32(frame), jnp.bool_(clear), scene, sky, basis)


def test_regroup_matches_wavefront_and_compacts(rtiow):
    """Dense lane regrouping is bit-identical to the uncompacted tracer,
    and the packed pool shrinks monotonically across cuts."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=8)
    ref = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                            phase_cuts=(), **kw))
    out, counts = render_image_regrouped(*_args(scene, sky, basis),
                                         cuts=(2, 4), debug_counts=True,
                                         **kw)
    assert np.array_equal(np.asarray(out), ref)
    rows = [int(c[0]) for c in counts]
    block_w = 128 // 4  # spp folded into lanes
    assert rows[0] == -(-W // block_w) * -(-H // 32) * 32  # padded tiles
    assert rows[0] > rows[1] > rows[2]  # live rays genuinely compact


def test_regroup_progressive_accumulation(rtiow):
    """clear=False accumulates exactly like the reference path across
    frames (the unpack only overwrites slots whose ray survived a cut)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=2, num_bounces=6)
    f1 = render_image_regrouped(*_args(scene, sky, basis, frame=0),
                                cuts=(2,), **kw)
    f2 = render_image_regrouped(
        f1, jnp.uint32(1), jnp.bool_(False), scene, sky, basis,
        cuts=(2,), **kw)
    r1 = render_image_wavefront(*_args(scene, sky, basis, frame=0),
                                phase_cuts=(), **kw)
    r2 = render_image_wavefront(
        r1, jnp.uint32(1), jnp.bool_(False), scene, sky, basis,
        phase_cuts=(), **kw)
    assert np.array_equal(np.asarray(f2), np.asarray(r2))


def test_regroup_small_uncoalesced_scene():
    """Tiny unculled scene at an odd viewport: padding lanes, partial
    tiles, and the no-culling sweep all survive the pack/unpack cycle."""
    W2, H2 = 50, 22
    desc = scenes.three_spheres()
    scene = desc.build()
    sky = to_sky_state(SkyParams())
    basis = CameraBasis.create(scenes.three_spheres_camera(), (W2, H2))
    acc = jnp.zeros((W2 * H2, 3), jnp.float32)
    kw = dict(width=W2, height=H2, spp=1, num_bounces=5)
    ref = render_image_wavefront(acc, jnp.uint32(7), jnp.bool_(True),
                                 scene, sky, basis, phase_cuts=(), **kw)
    out = render_image_regrouped(acc, jnp.uint32(7), jnp.bool_(True),
                                 scene, sky, basis, cuts=(1, 3), **kw)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_regroup_rejects_bad_args(rtiow):
    scene, sky, basis = rtiow
    with pytest.raises(ValueError):
        render_image_regrouped(*_args(scene, sky, basis), width=W, height=H,
                               spp=3, num_bounces=8, cuts=(2,))
    with pytest.raises(ValueError):
        render_image_regrouped(*_args(scene, sky, basis), width=W, height=H,
                               spp=4, num_bounces=8, cuts=())


def test_frustum_lists_conservative_extreme_camera():
    """Bounce-0 frustum chunk lists must be conservative under wide
    aperture (beam re-expands beyond the focus plane), wide FOV, and
    geometry behind the camera — any over-culling shows up as a bitwise
    mismatch vs the listless wavefront."""
    from weekend_raytracer_tpu.models.camera import Camera
    from weekend_raytracer_tpu.models.materials import Material
    from weekend_raytracer_tpu.models.scenes import SceneDesc, Sphere

    rs = np.random.RandomState(3)
    mats = [Material.lambertian((0.7, 0.4, 0.3)),
            Material.metal((0.9, 0.9, 0.9), fuzz=0.2)]
    spheres = [Sphere((0.0, -1000.0, 0.0), 1000.0, 0)]
    # spheres all around the eye, including behind the camera
    for i in range(80):
        p = rs.uniform(-12, 12, size=3)
        p[1] = abs(p[1]) * 0.3 + 0.2
        spheres.append(Sphere(tuple(p), float(rs.uniform(0.2, 0.7)), i % 2))
    desc = SceneDesc(materials=mats, spheres=spheres)
    scene = desc.build()
    sky = to_sky_state(SkyParams())
    cam = Camera.look_at((0.0, 1.5, 6.0), (0.0, 0.5, 0.0),
                         vfov_degrees=85.0, aperture=1.0,
                         focus_distance=5.0)
    W2, H2 = 64, 40
    basis = CameraBasis.create(cam, (W2, H2))
    acc = jnp.zeros((W2 * H2, 3), jnp.float32)
    kw = dict(width=W2, height=H2, spp=2, num_bounces=5)
    ref = render_image_wavefront(acc, jnp.uint32(1), jnp.bool_(True),
                                 scene, sky, basis, phase_cuts=(), **kw)
    out = render_image_regrouped(acc, jnp.uint32(1), jnp.bool_(True),
                                 scene, sky, basis, cuts=(2,), **kw)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_regroup_unculled_k1_matches(rtiow):
    """k1_chunk_size=0 (unculled resume sweep) uses the k1 array set's own
    padded sphere count — previously read past s_attrs1 (review r2)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=2, num_bounces=6)
    ref = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                            phase_cuts=(), **kw))
    out = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), k1_chunk_size=0,
                                            **kw))
    assert np.array_equal(out, ref)


def test_regroup_validation_errors(rtiow):
    scene, sky, basis = rtiow
    with pytest.raises(ValueError, match="<= 128"):
        render_image_regrouped(*_args(scene, sky, basis), width=W, height=H,
                               spp=256, num_bounces=8, cuts=(2,))
    with pytest.raises(ValueError, match="k1_tsub"):
        render_image_regrouped(*_args(scene, sky, basis), width=W, height=H,
                               spp=4, num_bounces=8, cuts=(2,), k1_tsub=24)


def test_frustum_lists_exclude_far_padding():
    """super_bounds pads chunk arrays with degenerate far-point boxes; the
    frustum lists must never include them (the listed sweep would read
    sphere attrs past the array end — review r2). Also checks the reach
    cut: chunks beyond MAX_T+lens_r are unhittable and dropped."""
    import jax.numpy as jnp

    from weekend_raytracer_tpu.models.camera import Camera
    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        MAX_T,
        build_frustum_lists,
    )

    # camera at origin aimed straight at the far corner, huge aperture
    cam = Camera.look_at((0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                         vfov_degrees=80.0, aperture=1.0,
                         focus_distance=5.0)
    basis = CameraBasis.create(cam, (64, 32))
    far = 1.0e9
    bounds = (
        jnp.asarray([2.0, far, 0.0]),   # lo x: real, pad, beyond-reach
        jnp.asarray([2.0, far, 0.0]),
        jnp.asarray([2.0, far, float(2 * MAX_T)]),
        jnp.asarray([3.0, far, 1.0]),   # hi
        jnp.asarray([3.0, far, 1.0]),
        jnp.asarray([3.0, far, float(2 * MAX_T) + 1.0]),
    )
    flist = np.asarray(build_frustum_lists(basis, bounds, 2, 1, 32, 32,
                                           64, 32))
    for t in range(flist.shape[0]):
        cnt = flist[t, 0]
        listed = set(flist[t, 1:1 + cnt].tolist())
        assert 1 not in listed, "far padding chunk must never be listed"
        assert 2 not in listed, "beyond-MAX_T chunk must never be listed"


def test_subcull_bit_identical(rtiow):
    """k1_subcull refines culling below the whole-tile chunk test with
    per-(subcull,128) sub-block slab tests; a skipped sub-block is one no
    ray of which can hit the chunk within its best-t, so results are
    bit-identical to the unsubbed sweep (docs/PERF.md round-3)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6)
    ref = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), **kw))
    sub = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), k1_subcull=8, **kw))
    np.testing.assert_array_equal(sub, ref)


def test_listed_sweep_bit_identical(rtiow):
    """listed=True swaps the per-chunk lax.cond sweep for the branchless
    chunk-list form (unconditional slab tests + SMEM list append +
    dynamic-trip fori). A chunk the cond form skips has tnear >= best-t
    for every live ray, so the strict-< merge can never pick its spheres:
    results are bit-identical. (Measured slower on chip — docs/PERF.md
    round 3 — so it's a non-default knob.)"""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6)
    ref = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), **kw))
    lst = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), listed=True, **kw))
    np.testing.assert_array_equal(lst, ref)


def test_mxu_sweep_statistical_equivalence(rtiow):
    """mxu_sweep=True computes the chunk sweeps via per-row dot_general
    (megakernel.mxu_sweep_amats): matmul accumulation order differs from
    the FMA chain, so pixels are NOT bit-identical — the right assertion
    is statistical (MC paths diverge chaotically at silhouettes under
    last-ulp t differences). The estimator must agree in mean radiance
    and almost all pixels must match exactly; megakernel and regroup
    must produce the same estimator under the knob as without it."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6)
    ref = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), **kw))
    mxu = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                            cuts=(2,), mxu_sweep=True,
                                            **kw))
    assert abs(mxu.mean() - ref.mean()) / ref.mean() < 2e-3
    assert (mxu == ref).mean() > 0.5  # most paths untouched by the ulp

    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        render_image_pallas,
    )

    mega = np.asarray(render_image_pallas(*_args(scene, sky, basis),
                                          mxu_sweep=True, **kw))
    assert abs(mega.mean() - ref.mean()) / ref.mean() < 2e-3


def test_default_cuts_scene_aware():
    """Small scenes keep the round-2 single-cut schedule (per-phase fixed
    costs dwarf their tiny sweeps: three-sphere 720p measured 1796 Mrays/s
    at (3,) vs 1284 at (2,4,6)); large scenes keep the multi-cut winner.
    Every schedule is clipped to the bounce budget and never empty."""
    from weekend_raytracer_tpu.ops.pallas.regroup import default_cuts

    assert default_cuts(8) == (2, 4, 6)        # no scene info -> large
    assert default_cuts(8, 486) == (2, 4, 6)   # RTiOW
    assert default_cuts(8, 10000) == (2, 4, 6)
    assert default_cuts(8, 5) == (3,)          # three-sphere
    assert default_cuts(10, 2) == (3,)
    assert default_cuts(3, 5) == (2,)          # clipped, never empty
    assert default_cuts(2, 5) == (1,)
    assert default_cuts(3) == (2,)
    for nb in range(2, 11):
        for ns in (None, 1, 64, 65, 500):
            cuts = default_cuts(nb, ns)
            assert cuts and all(0 < c < nb for c in cuts), (nb, ns, cuts)


def test_profile_stops_finite(rtiow):
    """profile_stop truncations (benchmarks/profile_regroup.py) return a
    finite scalar probe at every stage. Guards the probe against reading
    uninitialized pool tails: packed/K1 pools are dense-prefix-
    initialized, so a probe that touches dead tiles sums garbage (the
    round-4 "pack" probe bug, caught in interpret mode)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    # two stops only (suite-time budget): "pack" reads the dense-prefix
    # pool (the probe bug's trigger), "combine" covers the longest prefix
    for stop in ("pack", "combine"):
        v = np.asarray(render_image_regrouped(*_args(scene, sky, basis),
                                              profile_stop=stop, **kw))
        assert v.shape == () and np.isfinite(v), stop


def test_dyn_grid_bit_identical(rtiow):
    """Dynamic grid bounds (visit only live tiles in pack/K1/combine)
    are a pure scheduling change: outputs and per-phase live counts are
    bit-identical to the full static grid."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    ref, c_ref = render_image_regrouped(*_args(scene, sky, basis),
                                        dyn_grid=False, debug_counts=True,
                                        **kw)
    dyn, c_dyn = render_image_regrouped(*_args(scene, sky, basis),
                                        dyn_grid=True, debug_counts=True,
                                        **kw)
    assert np.array_equal(np.asarray(ref), np.asarray(dyn))
    assert [int(c[0]) for c in c_ref] == [int(c[0]) for c in c_dyn]


def test_combine_v2_bit_identical(rtiow):
    """The windowed-matmul combine level (round 4) must be bit-identical
    to the per-row-DMA v1: the one-hot row-select matmul runs at
    precision='highest' (exact f32 selection) and the lane pick is the
    same take_along_axis. Counts are pack outputs and must not change."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    v1, c1 = render_image_regrouped(*_args(scene, sky, basis),
                                    combine_v2=False, debug_counts=True,
                                    **kw)
    v2, c2 = render_image_regrouped(*_args(scene, sky, basis),
                                    combine_v2=True, debug_counts=True,
                                    **kw)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert [int(c[0]) for c in c1] == [int(c[0]) for c in c2]


def test_pack_v2_bit_identical(rtiow):
    """The matmul-merge pack (round 4) must be bit-identical to the
    scalar-merge v1 with identical per-phase live counts: the composed
    rank gather and one-hot destination-row matmuls (precision='highest')
    compute the same permutation, and the unconditional clamped row DMAs
    only ever write rows a later step, the flush, or the never-read
    dense tail owns."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    v1, c1 = render_image_regrouped(*_args(scene, sky, basis),
                                    pack_v2=False, debug_counts=True,
                                    **kw)
    v2, c2 = render_image_regrouped(*_args(scene, sky, basis),
                                    pack_v2=True, debug_counts=True,
                                    **kw)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert [int(c[0]) for c in c1] == [int(c[0]) for c in c2]


def test_skip_dead_bit_identical(rtiow):
    """skip_dead (live-tile indirection on pack #1 + the final combine
    level) is a pure scheduling change: the dense order, every live
    count, and the image are bit-identical to the full-grid v2 path
    (and so, transitively, to v1)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    ref, c_ref = render_image_regrouped(*_args(scene, sky, basis),
                                        combine_v2=True, pack_v2=True,
                                        skip_dead=False,
                                        debug_counts=True, **kw)
    sd, c_sd = render_image_regrouped(*_args(scene, sky, basis),
                                      skip_dead=True,
                                      debug_counts=True, **kw)
    assert np.array_equal(np.asarray(ref), np.asarray(sd))
    assert [int(c[0]) for c in c_ref] == [int(c[0]) for c in c_sd]


def test_skip_dead_requires_v2_kernels(rtiow):
    """The indirection is implemented on the v2 kernels only; the jit
    core refuses the unsupported combination instead of silently
    ignoring it."""
    scene, sky, basis = rtiow
    from weekend_raytracer_tpu.ops.pallas.regroup import (
        _render_image_regrouped_jit,
    )
    with pytest.raises(ValueError, match="skip_dead requires"):
        _render_image_regrouped_jit(
            *_args(scene, sky, basis), width=W, height=H, spp=4,
            num_bounces=6, cuts=(2,), skip_dead=True, pack_v2=False,
            combine_v2=False)


def test_skip_dead_all_dead_frame(rtiow):
    """A pure-sky frame (camera aimed straight up) kills every ray in
    K0, so n_live == 0: the indirect pack/combine run a single
    guard-off grid step and must leave the K0 contribution image
    untouched (the guard-off base copy keeps the aliased writeback
    idempotent — without it tile 0's contribution is clobbered)."""
    from weekend_raytracer_tpu.models.camera import Camera

    scene, sky, _ = rtiow
    up_cam = Camera.look_at((0.0, 5000.0, 0.0), (0.0, 6000.0, 0.0),
                            up=(1.0, 0.0, 0.0), vfov_degrees=20.0)
    basis_up = CameraBasis.create(up_cam, (W, H))
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    ref = render_image_regrouped(*_args(scene, sky, basis_up),
                                 combine_v2=True, pack_v2=True,
                                 skip_dead=False, **kw)
    sd, counts = render_image_regrouped(*_args(scene, sky, basis_up),
                                        skip_dead=True,
                                        debug_counts=True, **kw)
    assert all(int(c[0]) == 0 for c in counts[1:])  # every ray died in K0
    assert np.asarray(ref).max() > 0.0  # sky radiance, not a black frame
    assert np.array_equal(np.asarray(ref), np.asarray(sd))


def test_rowsweep_bit_identical(rtiow):
    """Row-granular K1 traversal (round 5): each 128-lane row sweeps only
    the chunks it enters (rank-select over a per-row mask + one-hot
    precision='highest' attribute matmuls). Bit-identical to the cond
    cull by the strict-< superset lemma — per row it sweeps a superset
    of the sequentially-culled entered set and a subset of the tile
    union, and any superset yields the same first-index-wins winner."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=8, cuts=(2, 4))
    ref, c_ref = render_image_regrouped(*_args(scene, sky, basis),
                                        rowsweep=False, debug_counts=True,
                                        **kw)
    for extra in (dict(), dict(k1_tsub=8), dict(k1_chunk_size=8),
                  dict(k1_chunk_size=8, k1_tsub=8),
                  dict(rowsweep_k0=True)):
        rs, c_rs = render_image_regrouped(*_args(scene, sky, basis),
                                          rowsweep=True, debug_counts=True,
                                          **kw, **extra)
        assert np.array_equal(np.asarray(ref), np.asarray(rs)), extra
        assert ([int(c[0]) for c in c_ref]
                == [int(c[0]) for c in c_rs]), extra


def test_pack_v2_full_pool_enclosed_scene():
    """An enclosed scene (camera inside a hollow lambertian sphere, no
    sky escape) keeps EVERY ray alive through every cut, driving the
    dense pool to full capacity — the exact case where pack_v2's
    clamped overflow DMAs used to alias the final live row (round-4
    advisor). With the spare dense tile they land in never-live rows:
    v1 and v2 must agree bit-for-bit and the counts must stay full."""
    import jax.numpy as jnp

    from weekend_raytracer_tpu import Material, SceneDesc, Sphere
    from weekend_raytracer_tpu.models.camera import Camera

    desc = SceneDesc(
        materials=[Material.lambertian((0.8, 0.7, 0.6))],
        spheres=[Sphere((0.0, 0.0, 0.0), -50.0, 0),  # hollow enclosure
                 Sphere((0.0, -2.0, 4.0), 1.0, 0)],
    )
    scene = desc.build()
    cam = Camera.look_at((0.0, 0.0, -8.0), (0.0, 0.0, 1.0),
                         vfov_degrees=60.0)
    basis = CameraBasis.create(cam, (W, H))
    sky = to_sky_state(SkyParams())
    kw = dict(width=W, height=H, spp=4, num_bounces=6, cuts=(2, 4))
    v1, c1 = render_image_regrouped(*_args(scene, sky, basis),
                                    pack_v2=False, debug_counts=True,
                                    **kw)
    v2, c2 = render_image_regrouped(*_args(scene, sky, basis),
                                    pack_v2=True, combine_v2=True,
                                    debug_counts=True, **kw)
    counts = [int(c[0]) for c in c1]
    assert counts[0] == counts[1] == counts[2]  # nothing ever dies
    assert counts == [int(c[0]) for c in c2]
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
