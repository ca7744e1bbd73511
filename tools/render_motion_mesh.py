"""Fit SMPL meshes to generated motion joints and export OBJ frames + GIF.

CLI analog of the reference render pipeline (visualize/render_mesh.py +
visualize/simplify_loc2rot.py npy2smpl): takes a (T, 22, 3) HumanML3D
joints .npy (e.g. recovered via eval/motion_math.recover_from_ric from a
t2m generation), runs the SMPLify-3D fit (eval/smpl_fit.joints2smpl), and
writes frame{i:03d}.obj files, the fitted thetas (rot6d, reference
[1,25,6,T] layout), and a rendered GIF.

    python tools/render_motion_mesh.py input=joints.npy out_dir=out \
        [smpl_npz=/mnt/smpl_neutral.npz] [gmm_npz=/mnt/gmm_08.npz] \
        [num_iters=150] [sample=0] [rep=0]

`input` is either a raw (T, 22, 3) joints array or an MDM-style
`results.npy` dict ({'motion': (N, J, 3, T), 'lengths', 'num_samples'} —
the reference vis_utils.npy2obj input; pick a clip with sample=/rep=).
Without `smpl_npz` the deterministic synthetic body model is used (the
MPG-licensed SMPL asset cannot ship; drop the converted npz in and the
same code renders the real body).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _load_joints(args):
    """Raw (T, J, 3) array or the MDM results.npy dict
    (vis_utils.npy2obj:10-33 indexing: absl = rep * num_samples + sample)."""
    import numpy as np

    raw = np.load(args["input"], allow_pickle=True)
    if raw.dtype == object:  # results.npy dict
        motions = raw[None][0]
        sample_i = int(args.get("sample", 0))
        rep_i = int(args.get("rep", 0))
        absl = rep_i * int(motions.get("num_samples", 1)) + sample_i
        clip = np.asarray(motions["motion"][absl])   # (J, 3, T)
        if clip.ndim != 3 or clip.shape[1] != 3:
            raise ValueError(f"expected (J, 3, T) motion, got {clip.shape}")
        joints = clip.transpose(2, 0, 1)             # (T, J, 3)
        lengths = motions.get("lengths")
        if lengths is not None:
            joints = joints[: int(np.asarray(lengths).reshape(-1)[absl])]
        return joints
    return raw


def main(argv):
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    import numpy as np

    from mmada_tpu.eval import mesh_render, smpl_fit

    joints = _load_joints(args)
    if joints.ndim != 3 or joints.shape[-1] != 3:
        raise ValueError(f"expected (T, J, 3) joints, got {joints.shape}")
    joints = joints[:, : smpl_fit.AMASS_NUM_JOINTS]

    model = (
        smpl_fit.BodyModel.from_npz(args["smpl_npz"])
        if args.get("smpl_npz") else smpl_fit.synthetic_body_model()
    )
    prior = (
        smpl_fit.GMMPrior.from_npz(args["gmm_npz"])
        if args.get("gmm_npz") else smpl_fit.l2_prior
    )
    cfg = smpl_fit.SMPLifyConfig(num_iters=int(args.get("num_iters", 150)))

    thetas, verts, betas = smpl_fit.joints2smpl(
        joints, model=model, pose_prior=prior, cfg=cfg
    )
    out_dir = args.get("out_dir", "mesh_out")
    os.makedirs(out_dir, exist_ok=True)
    mesh_render.save_obj_sequence(
        os.path.join(out_dir, "objs"), verts, np.asarray(model.faces)
    )
    np.save(os.path.join(out_dir, "smpl_thetas.npy"), thetas)
    gif = mesh_render.render_mesh_frames(
        verts, np.asarray(model.faces), os.path.join(out_dir, "mesh.gif")
    )
    print(f"wrote {verts.shape[0]} obj frames, smpl_thetas.npy, {gif}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
