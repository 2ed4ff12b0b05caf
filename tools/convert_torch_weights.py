"""Convert a reference torch checkpoint (.pth) to focoos_tpu npz weights.

Usage:
    python tools/convert_torch_weights.py model_final.pth fai_detr out_dir/

The output ``model_final.npz`` drops into a model run dir next to
``model_info.json`` and loads via ``FocoosModel.load_weights`` /
``ModelManager.get(<dir>)``.
"""

import os
import sys


def main(pth_path: str, family: str, out_dir: str):
    import numpy as np
    import torch

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from focoos_tpu.ports import ArtifactName
    from focoos_tpu.utils.checkpoint import flatten_tree
    from focoos_tpu.utils.torch_convert import convert_state_dict

    state = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = {k.removeprefix("module."): v.detach().numpy() for k, v in state.items()}

    variables, unmatched = convert_state_dict(state, family)
    if unmatched:
        print(f"warning: {len(unmatched)} torch keys unmatched:")
        for k in unmatched[:10]:
            print("   ", k)

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, ArtifactName.WEIGHTS.value)
    flat = {}
    for coll, tree in variables.items():
        flat.update(flatten_tree(tree, prefix=f"{coll}/"))
    np.savez(out, **flat)
    print(f"wrote {out} ({len(flat)} arrays)")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    main(*sys.argv[1:])
