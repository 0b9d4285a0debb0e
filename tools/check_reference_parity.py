"""Full-size forward parity vs the PyTorch reference.

Builds the SHIPPED-config reference models (36M VAE, 60M UNet) with random
torch init, imports the state dicts through compat/torch_import, and
compares fp32 forwards.  Runs only where the reference repo is available
(it is NOT vendored here).  Measured 2026-08-16: VAE encode 1.9e-6, decode
1.7e-5, UNet 7.9e-6 max abs diff -- far inside the 1e-4 parity target.
"""
import sys, os
os.environ["IDTPU_COMPILE_CACHE"] = ""  # keep CPU executables out of the shared cache
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch
# Usage: PYTHONPATH=<repo> python tools/check_reference_parity.py <reference_dir>
sys.path.insert(0, sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
from modules.vae import VAE as RefVAE
from modules.unet import Unet as RefUnet

from image_diffusion_tpu.compat.torch_import import import_unet, import_vae, to_jax_variables
from image_diffusion_tpu.core.config import UNetArch, VAEArch
from image_diffusion_tpu.models import build_unet, build_vae

torch.manual_seed(0)
ref_vae = RefVAE(3, [128,256,384], 3, "kl", None, None, None, 2, 2, [], 1, 128, 32).eval()
x = torch.randn(1, 3, 128, 128)
with torch.no_grad():
    z_ref, kl_ref, _ = ref_vae.encode(x, sample=False)
    xh_ref = ref_vae.decode(z_ref[:, :3])

state = {k: v.numpy() for k, v in ref_vae.state_dict().items()}
variables = to_jax_variables(import_vae(state))
model = build_vae(VAEArch(), dtype=jnp.float32)
xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
enc = jax.jit(lambda v, x: model.apply(v, x, sample=False, method="encode"))
z, kl, _ = enc(variables, xj)
print("FULL VAE encode maxdiff:", np.abs(np.asarray(z) - z_ref.numpy().transpose(0,2,3,1)).max(),
      "| kl rel:", abs(float(kl) - kl_ref.item()) / abs(kl_ref.item()))
dec = jax.jit(lambda v, z: model.apply(v, z, method="decode"))
xh = dec(variables, z[..., :3])
print("FULL VAE decode maxdiff:", np.abs(np.asarray(xh) - xh_ref.numpy().transpose(0,2,3,1)).max())

torch.manual_seed(1)
ref_unet = RefUnet(3, [128,256,384,512], [512,512], 512, 2, 8, 32, 3).eval()
xl = torch.randn(2, 3, 32, 32); t = torch.tensor([7, 900]); c = torch.tensor([0, 2])
mask = torch.tensor([[1.0],[0.0]])
with torch.no_grad():
    out_ref = ref_unet(xl, t, c, mask)
ustate = {k: v.numpy() for k, v in ref_unet.state_dict().items()}
uvars = to_jax_variables(import_unet(ustate, 2))
umodel = build_unet(UNetArch(), dtype=jnp.float32)
out = jax.jit(lambda v: umodel.apply(v, jnp.asarray(xl.numpy().transpose(0,2,3,1)),
                                     jnp.asarray(t.numpy()), jnp.asarray(c.numpy()),
                                     jnp.asarray(mask.numpy())))(uvars)
print("FULL UNet maxdiff:", np.abs(np.asarray(out) - out_ref.numpy().transpose(0,2,3,1)).max())
