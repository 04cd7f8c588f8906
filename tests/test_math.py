"""Unit tests for mo_renderer_tpu.math against hand-checked glam/bevy values.

Reference conventions under test:
- perspective_rh + Vulkan y-flip (mo_ecs/src/resource/camera.rs:225-240)
- look_at_rh (glam)
- light orthographic with swapped bottom/top (directional_light.rs:52-59)
- Transform TRS model matrix (transform.rs:167), direction = rot * +Z
- Transform::look_to back = -direction (transform.rs:349-358)
"""

import numpy as np
import pytest

from mo_renderer_tpu.math import quat, projections as proj
from mo_renderer_tpu.math.transform import Transform


def test_perspective_rh_matches_glam():
    # glam: Mat4::perspective_rh(PI/4, 16/9, 0.1, 1000)
    m = proj.perspective_rh(np.pi / 4, 16 / 9, 0.1, 1000.0)
    f = 1.0 / np.tan(np.pi / 8)
    assert np.isclose(m[0, 0], f / (16 / 9))
    assert np.isclose(m[1, 1], f)
    assert np.isclose(m[2, 2], 1000.0 / (0.1 - 1000.0))
    assert np.isclose(m[2, 3], 1000.0 * 0.1 / (0.1 - 1000.0))
    assert m[3, 2] == -1.0
    # point at z=-near maps to ndc z=0; z=-far maps to 1
    p_near = m @ np.array([0, 0, -0.1, 1.0], np.float32)
    p_far = m @ np.array([0, 0, -1000.0, 1.0], np.float32)
    assert np.isclose(p_near[2] / p_near[3], 0.0, atol=1e-6)
    assert np.isclose(p_far[2] / p_far[3], 1.0, atol=1e-5)


def test_vulkan_y_flip():
    m = proj.perspective_rh_vulkan(np.pi / 4, 1.0, 0.1, 100.0)
    # a point above center (+y view space) maps to negative-y clip... flipped to +
    p = m @ np.array([0.0, 1.0, -1.0, 1.0], np.float32)
    assert p[1] < 0 or m[1, 1] < 0
    assert m[1, 1] == -proj.perspective_rh(np.pi / 4, 1.0, 0.1, 100.0)[1, 1]


def test_look_at_rh():
    eye = np.array([0.0, 0.0, 5.0])
    m = proj.look_at_rh(eye, [0, 0, 0], [0, 1, 0])
    # eye maps to origin
    p = m @ np.array([0, 0, 5, 1.0], np.float32)
    assert np.allclose(p[:3], 0, atol=1e-6)
    # target maps to -z axis (RH: camera looks down -z)
    p = m @ np.array([0, 0, 0, 1.0], np.float32)
    assert np.allclose(p[:3], [0, 0, -5], atol=1e-6)


def test_orthographic_rh_depth_01():
    m = proj.orthographic_rh(-8, 8, -8, 8, 0.1, 100.0)
    p_near = m @ np.array([0, 0, -0.1, 1.0], np.float32)
    p_far = m @ np.array([0, 0, -100.0, 1.0], np.float32)
    assert np.isclose(p_near[2], 0.0, atol=1e-6)
    assert np.isclose(p_far[2], 1.0, atol=1e-5)
    p = m @ np.array([8, 8, -1, 1.0], np.float32)
    assert np.allclose(p[:2], [1, 1], atol=1e-6)


def test_quat_axis_angle_rotate():
    q = quat.from_rotation_y(np.pi / 2)
    v = quat.rotate(q, [0, 0, 1])
    # Rotating +Z by +90deg about Y gives +X
    assert np.allclose(v, [1, 0, 0], atol=1e-6)
    q = quat.from_rotation_x(np.pi / 2)
    v = quat.rotate(q, [0, 1, 0])
    assert np.allclose(v, [0, 0, 1], atol=1e-6)


def test_quat_mul_matches_mat3():
    a = quat.from_axis_angle([0.3, 0.5, -0.2], 1.1)
    b = quat.from_axis_angle([-0.7, 0.1, 0.4], -0.6)
    ab = quat.mul(a, b)
    ma = quat.to_mat3(a) @ quat.to_mat3(b)
    assert np.allclose(quat.to_mat3(ab), ma, atol=1e-5)


def test_quat_from_mat3_roundtrip():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        q = quat.normalize(rng.normal(size=4).astype(np.float32))
        q2 = quat.from_mat3(quat.to_mat3(q))
        # q and -q are the same rotation
        assert np.allclose(q, q2, atol=1e-4) or np.allclose(q, -q2, atol=1e-4)


def test_euler_yxz_roundtrip():
    q = quat.from_euler_yxz(0.7, 0.3, -0.2)
    y, x, z = quat.to_euler_yxz(q)
    assert np.isclose(y, 0.7, atol=1e-5)
    assert np.isclose(x, 0.3, atol=1e-5)
    assert np.isclose(z, -0.2, atol=1e-5)


def test_transform_direction_is_plus_z():
    # The reference's quirk: direction() = rotation * +Z (transform.rs:161).
    t = Transform.from_xyz(-3.0, 0.0, 3.0).with_rotation(
        quat.from_axis_angle([0, 1, 0], np.pi * 0.75)
    )
    d = t.direction()
    # rotating +Z about Y by 135deg: (sin135, 0, cos135)
    assert np.allclose(d, [np.sin(np.pi * 0.75), 0, np.cos(np.pi * 0.75)], atol=1e-6)


def test_looking_at_direction_points_away_from_target():
    # look_to sets back = -dir, and direction() = rot * Z = back.
    t = Transform.from_xyz(10.0, 10.0, 10.0).looking_at([0, 0, 0])
    d = t.direction()
    expected = np.array([10.0, 10.0, 10.0]) / np.linalg.norm([10.0, 10.0, 10.0])
    assert np.allclose(d, expected, atol=1e-5)


def test_model_matrix_trs_order():
    t = Transform(
        translation=[1, 2, 3],
        rotation=quat.from_rotation_z(np.pi / 2),
        scale=[2, 2, 2],
    )
    m = t.model_matrix()
    # point (1,0,0): scale->(2,0,0), rotate z90->(0,2,0), translate->(1,4,3)
    p = m @ np.array([1, 0, 0, 1.0], np.float32)
    assert np.allclose(p[:3], [1, 4, 3], atol=1e-5)
    assert np.allclose(p[:3], t.transform_point([1, 0, 0]), atol=1e-5)


def test_transform_align_doc_example():
    # Port of the reference's only executing doc-test (transform.rs:384-401):
    # align(Dir3::X, v, Dir3::Y, w) maps local X to v.
    t1 = Transform.from_xyz(1.0, 2.0, 3.0).looking_at([4.0, 5.0, 6.0], [0.0, 1.0, 0.0])
    # forward() should point at the target
    fwd = t1.forward()
    expect = np.array([3.0, 3.0, 3.0]) / np.linalg.norm([3.0, 3.0, 3.0])
    assert np.allclose(fwd, expect, atol=1e-5)


def test_from_matrix_roundtrip():
    t = Transform(
        translation=[0.5, -1.0, 2.0],
        rotation=quat.from_axis_angle([0.2, 0.9, -0.1], 0.8),
        scale=[1.5, 0.5, 2.0],
    )
    m = t.model_matrix()
    t2 = Transform.from_matrix(m)
    assert np.allclose(t2.model_matrix(), m, atol=1e-4)


def test_normal_matrix():
    t = Transform(scale=[2.0, 1.0, 1.0], rotation=quat.from_rotation_y(0.3))
    w = t.model_matrix()
    nm = proj.normal_matrix(w)
    # normals on a plane with normal n stay perpendicular to transformed tangents
    tangent = np.array([0.0, 0.0, 1.0])
    normal = np.array([1.0, 0.0, 0.0])
    wt = (w[:3, :3] @ tangent)
    wn = nm @ normal
    assert abs(np.dot(wt, wn)) < 1e-5


def test_directional_light_proj_view_shape():
    # DirectionalLight::proj_view (directional_light.rs:39-62): the ortho has
    # bottom=+h, top=-h (swapped for Vulkan).
    m = proj.orthographic_rh(-8.0, 8.0, 8.0, -8.0, 0.1, 100.0)
    # +y world (below, after swap) maps to ndc +y... point (0, 8, -1):
    p = m @ np.array([0.0, 8.0, -1.0, 1.0], np.float32)
    assert np.isclose(p[1], -1.0, atol=1e-6)
