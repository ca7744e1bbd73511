"""SMPL body-model fitting from 3D joints (joints2smpl / SMPLify-3D), JAX.

TPU-native rebuild of the reference mesh-fitting stack
(visualize/simplify_loc2rot.py:13-115, visualize/joints2smpl/src/smplify.py:44-279,
customloss.py:6-222, prior.py:97-229): recover SMPL pose/shape parameters
(and a posed mesh) from generated HumanML3D joint positions so motions can
be rendered as meshes instead of stick figures.

Re-designed for JAX instead of translated:
  * the SMPL forward (shape blendshapes → joint regression → forward
    kinematics → linear blend skinning) is one pure function, vmap-able
    over frames and jit-compiled — the reference loops torch modules
    per optimizer step;
  * both fitting stages (camera+orientation, then full body) are optax
    optimizers inside `lax.scan` — the whole fit is ONE compiled program
    per stage instead of hundreds of Python-side optimizer steps;
  * the MPG-licensed SMPL assets (body model pickle, GMM prior, mean
    pose h5) cannot ship; `BodyModel.from_npz` loads them when mounted,
    and `synthetic_body_model()` provides a deterministic low-poly
    humanoid with the same kinematic tree so the entire pipeline is
    testable asset-free (the fit math is identical either way).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

# SMPL kinematic tree (24 joints, standard parents array).
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8,
    9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21,
)
NUM_SMPL_JOINTS = 24
# HumanML3D / AMASS uses the first 22 SMPL joints (no hands)
# (reference config.py: amass_idx = range(22)).
AMASS_NUM_JOINTS = 22
# torso joints used for camera init / camera fitting
# (config.py JOINT_MAP: RHip=2, LHip=1, RShoulder=17, LShoulder=16).
TORSO_IDX = (2, 1, 17, 16)
# knee/elbow bend components of the 69-dim body pose with bend signs
# (customloss.py:15-21: indices [55,58,12,15] - 3 into body_pose).
ANGLE_PRIOR_IDX = (52, 55, 9, 12)
ANGLE_PRIOR_SIGNS = (1.0, -1.0, -1.0, -1.0)


# --------------------------------------------------------------------------
# rotations
# --------------------------------------------------------------------------

def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula, (..., 3) -> (..., 3, 3).

    The norm is smoothed (sqrt(|aa|² + ε)) so the gradient at the zero
    rotation is finite — the fit starts from a zero/mean pose and a bare
    `jnp.linalg.norm` would seed NaNs into the very first optimizer step.
    """
    angle = jnp.sqrt(jnp.sum(aa * aa, axis=-1, keepdims=True) + 1e-16)
    axis = aa / angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=aa.dtype)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    return eye + s * K + (1.0 - c) * (K @ K)


def matrix_to_rotation_6d(mat: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows (the reference uses
    pytorch3d's convention, rotation_conversions.py)."""
    return mat[..., :2, :].reshape(*mat.shape[:-2], 6)


# --------------------------------------------------------------------------
# body model
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BodyModel:
    """Functional SMPL-style body model (LBS, no pose blendshapes by
    default — they are included when the asset provides `posedirs`)."""

    v_template: jax.Array    # (V, 3)
    shapedirs: jax.Array     # (V, 3, n_betas)
    j_regressor: jax.Array   # (J, V)
    lbs_weights: jax.Array   # (V, J)
    faces: jax.Array         # (F, 3) int32
    posedirs: Optional[jax.Array] = None  # ((J-1)*9, V*3) or None

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @classmethod
    def from_npz(cls, path: str) -> "BodyModel":
        """Load a converted SMPL asset (convert the official pickle once
        with numpy: v_template/shapedirs/J_regressor/weights/f[/posedirs])."""
        data = np.load(path)
        return cls(
            v_template=jnp.asarray(data["v_template"], jnp.float32),
            shapedirs=jnp.asarray(data["shapedirs"], jnp.float32),
            j_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
            lbs_weights=jnp.asarray(data["weights"], jnp.float32),
            faces=jnp.asarray(data["f"], jnp.int32),
            posedirs=(jnp.asarray(data["posedirs"], jnp.float32)
                      if "posedirs" in data else None),
        )


def body_forward(
    model: BodyModel,
    betas: jax.Array,      # (n_betas,)
    pose_aa: jax.Array,    # (J, 3) axis-angle, row 0 = global orient
) -> tuple[jax.Array, jax.Array]:
    """(vertices (V,3), joints (J,3)) — shape blendshapes, joint
    regression, forward kinematics, linear blend skinning."""
    v_shaped = model.v_template + jnp.einsum(
        "vdb,b->vd", model.shapedirs, betas
    )
    j_rest = model.j_regressor @ v_shaped                     # (J, 3)
    rots = axis_angle_to_matrix(pose_aa)                      # (J, 3, 3)

    if model.posedirs is not None:
        pose_feat = (rots[1:] - jnp.eye(3)).reshape(-1)
        v_shaped = v_shaped + (pose_feat @ model.posedirs).reshape(-1, 3)

    parents = np.asarray(SMPL_PARENTS[: model.num_joints])
    # forward kinematics: parents precede children in the SMPL tree, so a
    # static python loop unrolls to J small matmuls (J=24 — negligible)
    world_rot = [rots[0]]
    world_pos = [j_rest[0]]
    for j in range(1, model.num_joints):
        p = int(parents[j])
        world_rot.append(world_rot[p] @ rots[j])
        world_pos.append(world_pos[p] + world_rot[p] @ (j_rest[j] - j_rest[p]))
    R = jnp.stack(world_rot)                                  # (J, 3, 3)
    t = jnp.stack(world_pos)                                  # (J, 3)
    joints = t

    # skinning: x' = Σ_j w_j (R_j (x − j_rest_j) + t_j)
    rel = v_shaped[None, :, :] - j_rest[:, None, :]           # (J, V, 3)
    posed = jnp.einsum("jab,jvb->jva", R, rel) + t[:, None, :]
    vertices = jnp.einsum("vj,jva->va", model.lbs_weights, posed)
    return vertices, joints


body_forward_batch = jax.vmap(body_forward, in_axes=(None, 0, 0))


def synthetic_body_model(seed: int = 0) -> BodyModel:
    """Deterministic low-poly humanoid with the SMPL kinematic tree: one
    small octahedron of 6 vertices rigidly bound per joint, a joint
    regressor that averages them back (exact), and 3 shape modes
    (global scale, limb length, width). Asset-free stand-in with the
    same interfaces as the real model — the fitting math cannot tell
    the difference."""
    rest = np.zeros((NUM_SMPL_JOINTS, 3), np.float32)
    # crude humanoid rest pose (y up): hips at origin
    rest[0] = (0, 0, 0)
    rest[1], rest[2] = (0.1, -0.05, 0), (-0.1, -0.05, 0)      # L/R hip
    rest[4], rest[5] = (0.1, -0.45, 0), (-0.1, -0.45, 0)      # knees
    rest[7], rest[8] = (0.1, -0.85, 0), (-0.1, -0.85, 0)      # ankles
    rest[10], rest[11] = (0.1, -0.95, 0.1), (-0.1, -0.95, 0.1)  # feet
    rest[3] = (0, 0.15, 0)                                     # spine1
    rest[6] = (0, 0.3, 0)                                      # spine2
    rest[9] = (0, 0.45, 0)                                     # spine3
    rest[12] = (0, 0.6, 0)                                     # neck
    rest[15] = (0, 0.72, 0)                                    # head
    rest[13], rest[14] = (0.08, 0.52, 0), (-0.08, 0.52, 0)     # collars
    rest[16], rest[17] = (0.2, 0.5, 0), (-0.2, 0.5, 0)         # shoulders
    rest[18], rest[19] = (0.45, 0.5, 0), (-0.45, 0.5, 0)       # elbows
    rest[20], rest[21] = (0.7, 0.5, 0), (-0.7, 0.5, 0)         # wrists
    rest[22], rest[23] = (0.78, 0.5, 0), (-0.78, 0.5, 0)       # hands

    octa = 0.03 * np.array([
        (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)
    ], np.float32)
    octa_faces = np.array([
        (0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
        (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5),
    ], np.int64)

    V = NUM_SMPL_JOINTS * 6
    v_template = (rest[:, None, :] + octa[None, :, :]).reshape(V, 3)
    faces = np.concatenate(
        [octa_faces + 6 * j for j in range(NUM_SMPL_JOINTS)]
    )
    weights = np.zeros((V, NUM_SMPL_JOINTS), np.float32)
    jreg = np.zeros((NUM_SMPL_JOINTS, V), np.float32)
    for j in range(NUM_SMPL_JOINTS):
        weights[6 * j: 6 * j + 6, j] = 1.0
        jreg[j, 6 * j: 6 * j + 6] = 1.0 / 6.0

    shapedirs = np.zeros((V, 3, 3), np.float32)
    shapedirs[:, :, 0] = 0.1 * v_template                  # global scale
    shapedirs[:, 1, 1] = 0.1 * v_template[:, 1]            # height
    shapedirs[:, 0, 2] = 0.1 * v_template[:, 0]            # width
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        j_regressor=jnp.asarray(jreg),
        lbs_weights=jnp.asarray(weights),
        faces=jnp.asarray(faces, jnp.int32),
    )


# --------------------------------------------------------------------------
# priors & losses (customloss.py / prior.py equivalents)
# --------------------------------------------------------------------------

def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robust error (customloss.py:6-12)."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


def angle_prior(body_pose: jax.Array) -> jax.Array:
    """Penalize unnatural knee/elbow bending (customloss.py:15-21);
    body_pose (B, 69)."""
    idx = jnp.asarray(ANGLE_PRIOR_IDX)
    signs = jnp.asarray(ANGLE_PRIOR_SIGNS, body_pose.dtype)
    return jnp.exp(body_pose[:, idx] * signs) ** 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GMMPrior:
    """Max-mixture Gaussian pose prior (prior.py:97-229). Load the SMPLify
    gmm_08 arrays when the (MPG-licensed) asset is mounted; `l2()` is the
    asset-free fallback with the same call shape."""

    means: jax.Array        # (N, 69)
    precisions: jax.Array   # (N, 69, 69)
    weights: jax.Array      # (N,) nll_weights — merged with covariance dets

    @classmethod
    def from_arrays(cls, means: np.ndarray, covars: np.ndarray,
                    weights: np.ndarray) -> "GMMPrior":
        """From the raw SMPLify gmm_08 fields (means/covars/weights),
        reproducing the reference's merged nll_weights construction
        (prior.py:145-159): w / ((2π)^(D/2) · sqrt(det Σ)/min sqrt(det Σ))."""
        precisions = np.stack([np.linalg.inv(c) for c in covars])
        sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covars])
        const = (2 * np.pi) ** (means.shape[1] / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))
        return cls(
            means=jnp.asarray(means, jnp.float32),
            precisions=jnp.asarray(precisions, jnp.float32),
            weights=jnp.asarray(nll_weights, jnp.float32),
        )

    @classmethod
    def from_npz(cls, path: str) -> "GMMPrior":
        d = np.load(path)
        if "covars" in d:  # raw SMPLify fields
            return cls.from_arrays(d["means"], d["covars"], d["weights"])
        return cls(
            means=jnp.asarray(d["means"], jnp.float32),
            precisions=jnp.asarray(d["precisions"], jnp.float32),
            weights=jnp.asarray(d["weights"], jnp.float32),
        )

    def __call__(self, body_pose: jax.Array, betas: jax.Array) -> jax.Array:
        diff = body_pose[:, None, :] - self.means[None]        # (B, N, 69)
        maha = 0.5 * jnp.einsum(
            "bni,nij,bnj->bn", diff, self.precisions, diff
        )
        # min over components of (mahalanobis − log weight): the reference's
        # "max mixture" (prior.py merged log-likelihood form)
        return jnp.min(maha + (-jnp.log(self.weights))[None], axis=-1)


def l2_prior(body_pose: jax.Array, betas: jax.Array) -> jax.Array:
    """L2Prior fallback (prior.py:91-96) when no GMM asset is mounted."""
    return jnp.sum(body_pose ** 2, axis=-1)


def camera_fitting_loss_3d(
    model_joints: jax.Array,    # (B, J, 3)
    camera_t: jax.Array,        # (B, 1, 3) or (B, 3)
    camera_t_est: jax.Array,
    j3d: jax.Array,             # (B, J, 3)
    depth_loss_weight: float = 100.0,
) -> jax.Array:
    """Torso alignment + depth anchor (customloss.py:192-222, AMASS
    category: same indices both sides). Reference quirk kept verbatim:
    `j3d_error_loss + depth_loss` broadcasts the (B, 1, 3) depth term
    against the (B, 4, 3) torso error before the final sum, so the camera
    anchor is effectively weighted 4x (golden-tested)."""
    cam = camera_t.reshape(camera_t.shape[0], 1, 3)
    moved = model_joints + cam
    idx = jnp.asarray(TORSO_IDX)
    j3d_err = (j3d[:, idx] - moved[:, idx]) ** 2
    depth = (depth_loss_weight ** 2) * (cam - camera_t_est.reshape(cam.shape)) ** 2
    return (j3d_err + depth).sum()


def body_fitting_loss_3d(
    body_pose: jax.Array,       # (B, 69)
    preserve_pose: jax.Array,
    betas: jax.Array,           # (B, n_betas)
    model_joints: jax.Array,    # (B, J_fit, 3) already index-selected
    camera_t: jax.Array,
    j3d: jax.Array,             # (B, J_fit, 3)
    pose_prior,
    joints3d_conf=1.0,
    sigma: float = 100.0,
    pose_prior_weight: float = 4.78 * 1.5,
    shape_prior_weight: float = 5.0,
    angle_prior_weight: float = 15.2,
    joint_loss_weight: float = 500.0,
    pose_preserve_weight: float = 0.0,
) -> jax.Array:
    """Full SMPLify-3D objective (customloss.py:128-188)."""
    cam = camera_t.reshape(camera_t.shape[0], 1, 3)
    err = gmof((model_joints + cam) - j3d, sigma)
    joint_loss = (joints3d_conf ** 2) * err.sum(-1)
    joint_loss = ((joint_loss_weight ** 2) * joint_loss).sum(-1)
    prior_loss = (pose_prior_weight ** 2) * pose_prior(body_pose, betas)
    ang_loss = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(-1)
    shape_loss = (shape_prior_weight ** 2) * (betas ** 2).sum(-1)
    preserve = (pose_preserve_weight ** 2) * (
        (body_pose - preserve_pose) ** 2
    ).sum(-1)
    return (joint_loss + prior_loss + ang_loss + shape_loss + preserve).sum()


# --------------------------------------------------------------------------
# SMPLify-3D
# --------------------------------------------------------------------------

def guess_init_3d(model_joints: jax.Array, j3d: jax.Array) -> jax.Array:
    """Camera translation init from torso correspondence
    (smplify.py:18-40, AMASS category)."""
    idx = jnp.asarray(TORSO_IDX)
    return (j3d[:, idx] - model_joints[:, idx]).sum(axis=1) / 4.0


@dataclasses.dataclass
class SMPLifyConfig:
    step_size: float = 1e-2
    num_iters: int = 150          # body stage (simplify_loc2rot.py:21)
    camera_iters: int = 20        # reference Adam branch (smplify.py:187)
    joint_loss_weight: float = 600.0
    pose_preserve_weight: float = 5.0
    num_fit_joints: int = AMASS_NUM_JOINTS


def smplify3d(
    model: BodyModel,
    init_pose: jax.Array,     # (B, 72) axis-angle (first 3 = global orient)
    init_betas: jax.Array,    # (B, n_betas)
    j3d: jax.Array,           # (B, J_fit, 3)
    conf_3d=1.0,
    pose_prior=l2_prior,
    cfg: SMPLifyConfig = SMPLifyConfig(),
):
    """Two-stage SMPLify fit (smplify.py:95-279): camera+orientation, then
    full body. Both stages are optax Adam inside `lax.scan`, jit-compiled.
    Returns (vertices, joints, pose, betas, camera_t, final_loss)."""
    nj = model.num_joints
    fit_idx = jnp.arange(cfg.num_fit_joints)

    def fk(pose72, betas):
        verts, joints = body_forward_batch(
            model, betas, pose72.reshape(-1, nj, 3)
        )
        return verts, joints

    body_pose = init_pose[:, 3:]
    global_orient = init_pose[:, :3]
    betas = init_betas
    preserve_pose = init_pose[:, 3:]

    _, joints0 = fk(init_pose, betas)
    cam_t = guess_init_3d(joints0, j3d)[:, None, :]   # (B, 1, 3)
    init_cam_t = cam_t

    # ---- stage 1: camera translation + global orientation ---------------
    def cam_loss(p):
        pose = jnp.concatenate([p["orient"], body_pose], axis=-1)
        _, joints = fk(pose, betas)
        return camera_fitting_loss_3d(joints, p["cam"], init_cam_t, j3d)

    p1 = {"orient": global_orient, "cam": cam_t}
    opt1 = optax.adam(cfg.step_size, b1=0.9, b2=0.999)

    @jax.jit
    def stage1(p):
        state = opt1.init(p)

        def step(carry, _):
            p, state = carry
            loss, grads = jax.value_and_grad(cam_loss)(p)
            updates, state = opt1.update(grads, state, p)
            return (optax.apply_updates(p, updates), state), loss

        (p, _), losses = jax.lax.scan(
            step, (p, state), None, length=cfg.camera_iters
        )
        return p, losses

    p1, _ = stage1(p1)
    global_orient, cam_t = p1["orient"], p1["cam"]

    # ---- stage 2: full body ---------------------------------------------
    def body_loss(p):
        pose = jnp.concatenate([p["orient"], p["body"]], axis=-1)
        _, joints = fk(pose, p["betas"])
        return body_fitting_loss_3d(
            p["body"], preserve_pose, p["betas"],
            joints[:, fit_idx], p["cam"], j3d, pose_prior,
            joints3d_conf=conf_3d,
            joint_loss_weight=cfg.joint_loss_weight,
            pose_preserve_weight=cfg.pose_preserve_weight,
        )

    p2 = {"orient": global_orient, "body": body_pose,
          "betas": betas, "cam": cam_t}
    opt2 = optax.adam(cfg.step_size, b1=0.9, b2=0.999)

    @jax.jit
    def stage2(p):
        state = opt2.init(p)

        def step(carry, _):
            p, state = carry
            loss, grads = jax.value_and_grad(body_loss)(p)
            updates, state = opt2.update(grads, state, p)
            return (optax.apply_updates(p, updates), state), loss

        (p, _), losses = jax.lax.scan(
            step, (p, state), None, length=cfg.num_iters
        )
        return p, losses

    p2, losses = stage2(p2)
    pose = jnp.concatenate([p2["orient"], p2["body"]], axis=-1)
    verts, joints = fk(pose, p2["betas"])
    final_loss = body_loss(p2)
    return verts, joints, pose, p2["betas"], p2["cam"], final_loss


def joints2smpl(
    joint_seq: np.ndarray,     # (T, 22, 3) HumanML3D joints
    model: Optional[BodyModel] = None,
    pose_prior=l2_prior,
    cfg: Optional[SMPLifyConfig] = None,
):
    """Fit a whole motion clip (simplify_loc2rot.py:63-114): batch = frames.
    Returns (thetas (1, 25, 6, T) rot6d + root-translation row, vertices
    (T, V, 3), betas)."""
    model = model or synthetic_body_model()
    cfg = cfg or SMPLifyConfig()
    t = joint_seq.shape[0]
    j3d = jnp.asarray(joint_seq, jnp.float32)
    init_pose = jnp.zeros((t, NUM_SMPL_JOINTS * 3), jnp.float32)
    init_betas = jnp.zeros((t, model.num_betas), jnp.float32)
    verts, joints, pose, betas, cam, loss = smplify3d(
        model, init_pose, init_betas, j3d, pose_prior=pose_prior, cfg=cfg
    )
    rot6d = matrix_to_rotation_6d(
        axis_angle_to_matrix(pose.reshape(t, NUM_SMPL_JOINTS, 3))
    )                                                     # (T, 24, 6)
    root = j3d[:, 0]                                      # (T, 3)
    root6 = jnp.concatenate([root, jnp.zeros_like(root)], -1)[:, None]
    thetas = jnp.concatenate([rot6d, root6], axis=1)      # (T, 25, 6)
    thetas = thetas[None].transpose(0, 2, 3, 1)           # (1, 25, 6, T)
    return np.asarray(thetas), np.asarray(verts), np.asarray(betas)
