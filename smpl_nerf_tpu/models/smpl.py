"""Differentiable SMPL body model in JAX (linear blend skinning).

Replaces the reference's `smplx` dependency (used at /root/reference/render.py:52,
train.py:213,243,262 and inside the dynamic pipelines,
models/append_vertices_pipeline.py:29-58, models/dynamic_pipeline.py:45-51).
Unlike smplx (torch, host), this forward is pure jnp — jittable, differentiable
wrt pose/betas, vmap-able, and runs *inside* the training step on TPU, which is
what the dynamic / image_wise / append_vertices model families need.

Two ways to get a model:
  * ``load_smpl_pkl(path)`` — parse the licensed SMPL .pkl the user supplies
    (same file the reference expects at SMPLs/smpl/models/basicModel_f_...pkl;
    handles chumpy arrays without importing chumpy).
  * ``procedural_human()`` — a built-in articulated human with the SAME 24-joint
    SMPL kinematic tree and 69-dim body_pose contract, built from capsule limbs
    with smooth skinning weights and striped per-vertex colors. The whole
    framework (dataset generation -> training -> evaluation) runs end-to-end
    without licensed data; swap in the real pkl for strict SMPL geometry.

Pose convention matches SMPL: body_pose[69] = axis-angle of joints 1..23,
pose[3*(j-1):3*j] rotates the subtree below joint j around joint j. The
reference's "arm angles" at indices 38/41 are the z-rotations of the R/L collar
joints (13/14).
"""
from __future__ import annotations

import pickle
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_JOINTS = 24
PARENTS = np.array([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12,
                    13, 14, 16, 17, 18, 19, 20, 21], np.int32)


class SmplModel(NamedTuple):
    """Static model data (numpy; closed over by jitted functions)."""
    v_template: np.ndarray      # [V, 3]
    shapedirs: np.ndarray       # [V, 3, B] shape blendshapes
    posedirs: np.ndarray        # [V, 3, 207] pose blendshapes (may be zeros)
    joint_regressor: np.ndarray  # [24, V]
    lbs_weights: np.ndarray     # [V, 24]
    faces: np.ndarray           # [F, 3] int32
    parents: np.ndarray         # [24]
    vertex_colors: Optional[np.ndarray] = None  # [V, 3] in [0,1] (procedural)
    uv: Optional[np.ndarray] = None             # [V, 2] (real SMPL + uv map)
    rest_joints: Optional[np.ndarray] = None    # [24, 3] exact rest joints
                                                # (procedural model; bypasses the
                                                # regressor since its shapedirs
                                                # are zero)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Batched axis-angle [..., 3] -> rotation matrices [..., 3, 3].

    Gradient-safe at the zero rotation: sqrt(max(|aa|^2, eps)) keeps the
    norm's derivative finite at 0 (d||aa||/daa = aa/||aa|| NaNs there, and
    zero joint angles are the COMMON case in pose sweeps).
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-16))
    axis = axis_angle / jnp.maximum(angle, 1e-8)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zeros, -z, y], -1),
        jnp.stack([z, zeros, -x], -1),
        jnp.stack([-y, x, zeros], -1),
    ], -2)
    a = angle[..., None]
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * KK


def smpl_forward(model: SmplModel, betas: jnp.ndarray, body_pose: jnp.ndarray,
                 global_orient: Optional[jnp.ndarray] = None,
                 transl: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LBS forward: (betas [B], body_pose [69]) -> vertices [V, 3].

    Differentiable wrt betas and body_pose. The per-joint chain walk is a
    Python loop over the STATIC 24-joint tree — it unrolls at trace time into
    a fixed graph (no dynamic control flow under jit).
    """
    v_template = jnp.asarray(model.v_template, jnp.float32)
    betas = jnp.asarray(betas, jnp.float32).reshape(-1)
    num_betas = min(betas.shape[0], model.shapedirs.shape[-1])
    shapedirs = jnp.asarray(model.shapedirs[..., :num_betas], jnp.float32)

    # shape blendshapes
    v_shaped = v_template + jnp.einsum("vcb,b->vc", shapedirs, betas[:num_betas])
    if model.rest_joints is not None:
        joints = jnp.asarray(model.rest_joints, jnp.float32)
    else:
        joints = jnp.matmul(jnp.asarray(model.joint_regressor, jnp.float32), v_shaped,
                            precision=jax.lax.Precision.HIGHEST)  # [24, 3]

    # per-joint rotations
    body_pose = jnp.asarray(body_pose, jnp.float32).reshape(23, 3)
    if global_orient is None:
        global_orient = jnp.zeros((3,), jnp.float32)
    full_pose = jnp.concatenate([global_orient.reshape(1, 3), body_pose], 0)  # [24, 3]
    rots = rodrigues(full_pose)  # [24, 3, 3]

    # pose blendshapes: (R_j - I) for j=1..23 flattened -> 207 features
    if model.posedirs.size:
        pose_feature = (rots[1:] - jnp.eye(3)).reshape(-1)  # [207]
        v_shaped = v_shaped + jnp.einsum(
            "vcp,p->vc", jnp.asarray(model.posedirs, jnp.float32), pose_feature)

    # forward-kinematics chain (static unroll)
    parents = model.parents
    transforms = [None] * NUM_JOINTS
    transforms[0] = jnp.concatenate([
        jnp.concatenate([rots[0], joints[0][:, None]], 1),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], 0)
    for j in range(1, NUM_JOINTS):
        rel = jnp.concatenate([
            jnp.concatenate([rots[j], (joints[j] - joints[parents[j]])[:, None]], 1),
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], 0)
        transforms[j] = transforms[parents[j]] @ rel
    A = jnp.stack(transforms)  # [24, 4, 4] global joint transforms

    # remove rest-pose joint locations: G_j = A_j @ inv(T_rest_j)
    # inv(T_rest) for pure translation is translate(-J); fold it in directly.
    joints_h = jnp.einsum("jrc,jc->jr", A[:, :3, :3], joints)  # A_rot @ J
    G = A.at[:, :3, 3].add(-joints_h)  # [24, 4, 4]

    # linear blend skinning
    W = jnp.asarray(model.lbs_weights, jnp.float32)  # [V, 24]
    hi = jax.lax.Precision.HIGHEST
    T = jnp.einsum("vj,jrc->vrc", W, G, precision=hi)  # [V, 4, 4]
    v_hom = jnp.concatenate([v_shaped, jnp.ones_like(v_shaped[:, :1])], 1)
    verts = jnp.einsum("vrc,vc->vr", T, v_hom, precision=hi)[:, :3]
    if transl is not None:
        verts = verts + jnp.asarray(transl, jnp.float32).reshape(1, 3)
    return verts


# --------------------------------------------------------------------------
# Licensed SMPL pkl loading (chumpy-free)
# --------------------------------------------------------------------------

class _ChumpyUnpickler(pickle.Unpickler):
    """Unpickle SMPL pkls without chumpy: map ch.Ch arrays to plain numpy."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            class _Stub:
                def __setstate__(self, state):
                    self.__dict__.update(state if isinstance(state, dict) else {})
            return _Stub
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            from scipy.sparse import csc_matrix
            return csc_matrix
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    if hasattr(x, "x"):  # chumpy stub: data lives in attribute 'x'
        return np.asarray(x.x)
    return np.asarray(x)


def load_smpl_pkl(path: str, uv_map_path: Optional[str] = None) -> SmplModel:
    """Load a licensed SMPL model pkl (e.g. basicModel_f_lbs_10_207_0_v1.0.0.pkl)."""
    with open(path, "rb") as fh:
        data = _ChumpyUnpickler(fh, encoding="latin1").load()
    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    joint_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data["f"]).astype(np.int32)
    uv = np.load(uv_map_path).astype(np.float32) if uv_map_path else None
    return SmplModel(v_template, shapedirs, posedirs, joint_regressor,
                     lbs_weights, faces, PARENTS.copy(), None, uv)


# --------------------------------------------------------------------------
# Procedural human (no licensed data required)
# --------------------------------------------------------------------------

_REST_JOINTS = np.array([
    [0.00, 0.00, 0.00],    # 0 pelvis
    [0.09, -0.09, 0.00],   # 1 L_hip
    [-0.09, -0.09, 0.00],  # 2 R_hip
    [0.00, 0.11, 0.00],    # 3 spine1
    [0.10, -0.48, 0.00],   # 4 L_knee
    [-0.10, -0.48, 0.00],  # 5 R_knee
    [0.00, 0.23, 0.00],    # 6 spine2
    [0.11, -0.85, 0.00],   # 7 L_ankle
    [-0.11, -0.85, 0.00],  # 8 R_ankle
    [0.00, 0.33, 0.00],    # 9 spine3
    [0.12, -0.93, 0.10],   # 10 L_foot
    [-0.12, -0.93, 0.10],  # 11 R_foot
    [0.00, 0.45, 0.00],    # 12 neck
    [0.06, 0.40, 0.00],    # 13 L_collar
    [-0.06, 0.40, 0.00],   # 14 R_collar
    [0.00, 0.58, 0.00],    # 15 head
    [0.17, 0.42, 0.00],    # 16 L_shoulder
    [-0.17, 0.42, 0.00],   # 17 R_shoulder
    [0.43, 0.42, 0.00],    # 18 L_elbow
    [-0.43, 0.42, 0.00],   # 19 R_elbow
    [0.68, 0.42, 0.00],    # 20 L_wrist
    [-0.68, 0.42, 0.00],   # 21 R_wrist
    [0.76, 0.42, 0.00],    # 22 L_hand
    [-0.76, 0.42, 0.00],   # 23 R_hand
], np.float32)

# capsule limbs: (joint the capsule is skinned to, end point spec, radius, color seed)
# each bone runs from joint j toward a target (child joint or an offset).
_BONES = [
    # (skin_joint, start_joint, end_joint_or_offset, radius_start, radius_end, hue)
    (0, 0, 3, 0.115, 0.105, 0.00),        # pelvis->spine1 (lower torso)
    (3, 3, 6, 0.105, 0.10, 0.08),         # spine1->spine2
    (6, 6, 9, 0.10, 0.095, 0.16),         # spine2->spine3 (chest)
    (9, 9, 12, 0.095, 0.05, 0.24),        # spine3->neck
    (12, 12, 15, 0.035, 0.035, 0.32),     # neck
    (15, 15, (0.0, 0.14, 0.02), 0.085, 0.075, 0.40),  # head
    (1, 1, 4, 0.072, 0.055, 0.50),        # L thigh
    (2, 2, 5, 0.072, 0.055, 0.55),        # R thigh
    (4, 4, 7, 0.05, 0.038, 0.60),         # L shin
    (5, 5, 8, 0.05, 0.038, 0.65),         # R shin
    (7, 7, 10, 0.035, 0.03, 0.70),        # L foot
    (8, 8, 11, 0.035, 0.03, 0.73),        # R foot
    (13, 13, 16, 0.05, 0.045, 0.78),      # L collar->shoulder
    (14, 14, 17, 0.05, 0.045, 0.80),      # R collar->shoulder
    (16, 16, 18, 0.045, 0.036, 0.84),     # L upper arm
    (17, 17, 19, 0.045, 0.036, 0.87),     # R upper arm
    (18, 18, 20, 0.034, 0.028, 0.90),     # L forearm
    (19, 19, 21, 0.034, 0.028, 0.93),     # R forearm
    (20, 20, 22, 0.027, 0.022, 0.96),     # L hand
    (21, 21, 23, 0.027, 0.022, 0.98),     # R hand
]


def _hsv_to_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]


def _capsule(start, end, r0, r1, rings, segments):
    """Capsule vertices/faces from `start` to `end` with lerped radius."""
    start, end = np.asarray(start, np.float64), np.asarray(end, np.float64)
    axis = end - start
    length = np.linalg.norm(axis)
    axis_n = axis / max(length, 1e-9)
    # orthonormal frame
    up = np.array([0.0, 0.0, 1.0]) if abs(axis_n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(axis_n, up); u /= np.linalg.norm(u)
    w = np.cross(axis_n, u)
    verts, params = [], []  # params: t in [0,1] along bone for weights/colors
    cap_rings = 3
    ts = np.concatenate([
        np.zeros(cap_rings),        # bottom cap rings (t=0)
        np.linspace(0, 1, rings),   # cylinder
        np.ones(cap_rings),         # top cap rings (t=1)
    ])
    cap_angles_bottom = np.linspace(-np.pi / 2, 0, cap_rings, endpoint=False)
    cap_angles_top = np.linspace(0, np.pi / 2, cap_rings + 1)[1:]
    ring_idx = 0
    all_rings = []
    for k, t in enumerate(ts):
        r = r0 + (r1 - r0) * t
        center = start + axis * t
        if k < cap_rings:  # bottom hemisphere
            a = cap_angles_bottom[k]
            ring_r = r * np.cos(a)
            center = center + axis_n * (r * np.sin(a))
        elif k >= cap_rings + rings:  # top hemisphere
            a = cap_angles_top[k - cap_rings - rings]
            ring_r = r * np.cos(a)
            center = center + axis_n * (r * np.sin(a))
        else:
            ring_r = r
        ring = []
        for s in range(segments):
            ang = 2 * np.pi * s / segments
            p = center + ring_r * (np.cos(ang) * u + np.sin(ang) * w)
            ring.append(len(verts))
            verts.append(p)
            params.append(t)
        all_rings.append(ring)
        ring_idx += 1
    faces = []
    for k in range(len(all_rings) - 1):
        a_ring, b_ring = all_rings[k], all_rings[k + 1]
        for s in range(segments):
            s2 = (s + 1) % segments
            faces.append([a_ring[s], b_ring[s], b_ring[s2]])
            faces.append([a_ring[s], b_ring[s2], a_ring[s2]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32), np.asarray(params, np.float32)


def procedural_human(rings: int = 7, segments: int = 12) -> SmplModel:
    """Built-in articulated human: SMPL kinematic tree, capsule limbs, striped colors.

    Default tessellation gives ~5k vertices / ~10k faces (comparable to SMPL's
    6890/13776). Skinning weights blend smoothly between the bone's joint and
    its parent near the joint origin, so limbs bend without tearing.
    """
    all_v, all_f, all_w, all_c = [], [], [], []
    offset = 0
    for (skin_j, start_j, end_spec, r0, r1, hue) in _BONES:
        start = _REST_JOINTS[start_j]
        if isinstance(end_spec, tuple):
            end = start + np.asarray(end_spec, np.float32)
        else:
            end = _REST_JOINTS[end_spec]
        v, f, t = _capsule(start, end, r0, r1, rings, segments)
        all_v.append(v)
        all_f.append(f + offset)
        offset += len(v)
        # skinning: blend toward parent joint near the bone origin (t < 0.25)
        w = np.zeros((len(v), NUM_JOINTS), np.float32)
        parent = PARENTS[skin_j] if PARENTS[skin_j] >= 0 else skin_j
        blend = np.clip(0.25 - t, 0.0, 0.25) / 0.25 * 0.5  # up to 50% parent at base
        w[:, skin_j] = 1.0 - blend
        w[:, parent] += blend
        all_w.append(w)
        # striped per-vertex colors: base hue per bone + stripes along the bone
        base = np.asarray(_hsv_to_rgb(hue, 0.55, 0.85), np.float32)
        alt = np.asarray(_hsv_to_rgb((hue + 0.45) % 1.0, 0.65, 0.6), np.float32)
        stripe = 0.5 * (1 + np.sin(t * 24.0))[:, None]
        all_c.append(base[None] * stripe + alt[None] * (1 - stripe))
    v_template = np.concatenate(all_v)
    faces = np.concatenate(all_f)
    lbs_weights = np.concatenate(all_w)
    colors = np.concatenate(all_c)
    V = len(v_template)
    # approximate regressor (inverse-distance over nearest vertices) kept for
    # API parity; the exact rest joints are stored in rest_joints and used by
    # smpl_forward since the procedural model's shapedirs are zero.
    joint_regressor = np.zeros((NUM_JOINTS, V), np.float32)
    for j in range(NUM_JOINTS):
        d = np.linalg.norm(v_template - _REST_JOINTS[j], axis=1)
        nearest = np.argsort(d)[:8]
        w = 1.0 / np.maximum(d[nearest], 1e-4)
        joint_regressor[j, nearest] = w / w.sum()
    return SmplModel(
        v_template=v_template,
        shapedirs=np.zeros((V, 3, 10), np.float32),
        posedirs=np.zeros((V, 3, 0), np.float32),
        joint_regressor=joint_regressor,
        lbs_weights=lbs_weights,
        faces=faces,
        parents=PARENTS.copy(),
        vertex_colors=colors.astype(np.float32),
        rest_joints=_REST_JOINTS.copy(),
    )


def get_human_poses(joints, start_angle: float, end_angle: float,
                    number_steps: int) -> np.ndarray:
    """[N, 1, 69] pose sweep: the listed joints get angle(deg->rad), rest zero.

    Mirrors /root/reference/render.py:190-220.
    """
    angles = np.linspace(start_angle, end_angle, number_steps)
    poses = np.zeros((number_steps, 1, 69), np.float32)
    for i, angle in enumerate(angles):
        for joint in joints:
            poses[i, 0, int(joint)] = np.deg2rad(angle)
    return poses


_DEFAULT_BETAS = np.array([[-0.3596, -1.0232, -1.7584, -2.0465, 0.3387,
                            -0.8562, 0.8869, 0.5013, 0.5338, -0.0210]], np.float32)
_DEFAULT_EXPRESSION = np.array([[2.7228, -1.8139, 0.6270, -0.5565, 0.3251,
                                 0.5643, -1.2158, 1.4149, 0.4050, 0.6516]], np.float32)


def default_betas() -> np.ndarray:
    """The fixed betas the reference hardcodes (render.py:54-55)."""
    return _DEFAULT_BETAS.copy()


def default_expression() -> np.ndarray:
    """The fixed expression vector the reference hardcodes (render.py:56-57)."""
    return _DEFAULT_EXPRESSION.copy()


def distorted_betas(betas: np.ndarray, var: Optional[float] = None,
                    mean: Optional[float] = None,
                    beta0: Optional[float] = None,
                    rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Shape-coefficient distortion of get_smpl_mesh_distorted
    (reference render.py:75-139, dead on its main path; kept for parity).

    var:   add N(0, var) noise to every beta (betas += sqrt(var)*randn).
    mean:  shift beta[0] by `mean` — the reference writes `betas[0] + mean`,
           a no-op missing its assignment; the intended `+=` is implemented.
    beta0: overwrite beta[0] outright.
    Combine with smpl_forward to get the distorted mesh:
        verts = smpl_forward(model, distorted_betas(betas, var=v), pose)
    """
    arr = np.array(betas, np.float32, copy=True)
    out = arr.reshape(-1)
    rng = rng or np.random.RandomState(0)
    if var is not None:
        out += (var ** 0.5) * rng.randn(out.shape[0]).astype(np.float32)
    if mean is not None:
        out[0] += mean
    if beta0 is not None:
        out[0] = beta0
    return arr
