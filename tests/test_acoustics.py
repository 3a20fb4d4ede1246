"""Acoustics layer tests: geometry, attenuation, image-source tree vs a
NumPy oracle re-implementing the reference BFS semantics (utils.py:15-106)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import acoustics
from pyaudiolocalization_tpu.utils.materials import MaterialTable, material_properties


def ref_speed_of_sound(t, h, p=101.325):
    if t < -50 or t > 50:
        t = 20
    if h < 0 or h > 100:
        h = 50
    return 331 + 0.6 * t + 0.0124 * h + 0.0006 * (p - 101.325)


def ref_reflect(point, plane):
    p = np.asarray(point, float)
    a, b, c, d = plane
    denom = a * a + b * b + c * c
    factor = 2 * (a * p[0] + b * p[1] + c * p[2] + d) / denom
    return p - np.array([a, b, c]) * factor


def ref_attenuation(dist, material, freq, props):
    d = max(dist, 0.1)
    if material not in props:
        material = "air"
    return (1 / d) * np.exp(-props[material]["freq"] * freq * d) * np.exp(
        -props[material]["absorption"] * d)


def ref_image_sources(source, planes, max_order, frequency, props, mics,
                      threshold=0.01):
    """NumPy oracle for generate_image_sources_iterative (utils.py:67-106)."""
    image_sources = []
    current = [np.asarray(source, float)]
    seen = {tuple(np.round(source, 6))}
    for _ in range(1, max_order + 1):
        new = []
        for src in current:
            for plane in planes:
                img = ref_reflect(src, plane["plane"])
                key = tuple(np.round(img, 6))
                if key not in seen:
                    mat = plane.get("material", "air")
                    atts = [ref_attenuation(np.linalg.norm(img - np.asarray(m)),
                                            mat, frequency, props) for m in mics]
                    if np.mean(atts) > threshold and np.min(atts) > threshold / 2:
                        seen.add(key)
                        image_sources.append({"source": img, "material": mat})
                        new.append(img)
        current = new
        if not current:
            break
    return image_sources


def test_speed_of_sound():
    for t, h in [(20, 50), (0, 80), (-60, 50), (20, 150), (35, 10)]:
        got = float(acoustics.speed_of_sound(jnp.asarray(float(t)), jnp.asarray(float(h))))
        np.testing.assert_allclose(got, ref_speed_of_sound(t, h), rtol=1e-12)
    np.testing.assert_allclose(float(acoustics.speed_of_sound(20.0, 50.0)),
                               343.62, atol=0.01)  # SURVEY.md measured value


def test_reflect_point(rng):
    for _ in range(10):
        p = rng.normal(size=3)
        plane = rng.normal(size=4)
        got = np.asarray(acoustics.reflect_point_across_plane(
            jnp.asarray(p), jnp.asarray(plane)))
        np.testing.assert_allclose(got, ref_reflect(p, plane), atol=1e-12)
        # involution
        twice = np.asarray(acoustics.reflect_point_across_plane(
            jnp.asarray(got), jnp.asarray(plane)))
        np.testing.assert_allclose(twice, p, atol=1e-10)


def test_attenuation_matches_reference():
    table = MaterialTable.from_dict(material_properties)
    at = jnp.asarray(table.absorption)
    ft = jnp.asarray(table.freq)
    for mat in ["air", "wood", "metal"]:
        for d in [0.05, 0.5, 2.0]:
            for f in [0.0, 1.0, 1000.0]:
                got = float(acoustics.calculate_attenuation(
                    jnp.asarray(d), table.id_of(mat), jnp.asarray(f), at, ft))
                ref = ref_attenuation(d, mat, f, material_properties)
                np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-300)


def _run_image_sources(source, planes_cfg, mics, max_order, freq, props,
                       threshold=0.01):
    table = MaterialTable.from_dict(props)
    coeffs = jnp.asarray(np.array([p["plane"] for p in planes_cfg], float))
    mids = jnp.asarray(np.array([table.id_of(p.get("material", "air"), strict=True)
                                 for p in planes_cfg], np.int32))
    out = acoustics.image_sources(
        jnp.asarray(np.asarray(source, float)), coeffs, mids,
        jnp.asarray(np.asarray(mics, float)), freq,
        jnp.asarray(table.absorption), jnp.asarray(table.freq),
        max_order, threshold)
    acc = np.asarray(out.accepted)
    pos = np.asarray(out.positions)[acc]
    mats = [table.names[i] for i in np.asarray(out.material_ids)[acc]]
    return pos, mats


MICS = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def test_default_config_culls_all_images():
    """SURVEY.md Q2: the reference's default materials underflow attenuation
    to ~0, so the default scene yields ZERO image sources — reproduced."""
    planes = [{"plane": [1, 0, 0, -5], "material": "wood"},
              {"plane": [0, 1, 0, -5], "material": "metal"},
              {"plane": [0, 0, 1, -5], "material": "wood"}]
    pos, _ = _run_image_sources([0.5, 0.5, 0.5], planes, MICS, 3, 1000.0,
                                material_properties)
    ref = ref_image_sources([0.5, 0.5, 0.5], planes, 3, 1000.0,
                            material_properties, MICS)
    assert len(ref) == 0
    assert len(pos) == 0


@pytest.mark.parametrize("max_order", [1, 2, 3])
def test_image_sources_match_oracle_with_sane_materials(max_order):
    """With per-kHz-style coefficients images survive; the accepted set must
    match the reference BFS node for node, in order."""
    props = {"air": {"absorption": 0.0001, "freq": 1e-6},
             "brick": {"absorption": 0.001, "freq": 2e-6},
             "glass": {"absorption": 0.002, "freq": 1e-6}}
    planes = [{"plane": [1, 0, 0, -3], "material": "brick"},
              {"plane": [0, 1, 0, -3], "material": "glass"},
              {"plane": [0, 0, 1, -2], "material": "brick"},
              {"plane": [1, 1, 0, -6], "material": "glass"}]
    src = [0.4, 0.7, 0.3]
    pos, mats = _run_image_sources(src, planes, MICS, max_order, 1000.0, props)
    ref = ref_image_sources(src, planes, max_order, 1000.0, props, MICS)
    assert len(pos) == len(ref)
    # Note: dense-tree order is BFS by (parent, plane) like the reference.
    for got_p, got_m, r in zip(pos, mats, ref):
        np.testing.assert_allclose(got_p, r["source"], atol=1e-9)
        assert got_m == r["material"]


def test_image_sources_dedupe_parallel_planes():
    """Two parallel planes: second-order images bounce back onto the source
    and earlier images; dedupe must drop them exactly like the reference."""
    props = {"air": {"absorption": 0.0001, "freq": 1e-6}}
    planes = [{"plane": [1, 0, 0, 0], "material": "air"},
              {"plane": [1, 0, 0, -2], "material": "air"}]
    src = [0.5, 0.5, 0.5]
    pos, _ = _run_image_sources(src, planes, MICS, 3, 100.0, props)
    ref = ref_image_sources(src, planes, 3, 100.0, props, MICS)
    assert len(pos) == len(ref)
    for got_p, r in zip(pos, ref):
        np.testing.assert_allclose(got_p, r["source"], atol=1e-9)


def test_no_planes():
    out = acoustics.image_sources(
        jnp.asarray([0.5, 0.5, 0.5]), jnp.zeros((0, 4)),
        jnp.zeros((0,), jnp.int32), jnp.asarray(np.array(MICS, float)),
        1000.0, jnp.asarray([0.01]), jnp.asarray([0.1]), 3)
    assert out.positions.shape == (0, 3)
