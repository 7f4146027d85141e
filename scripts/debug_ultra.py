"""Debug harness for the UltraPlonk lookup argument: host-recompute every
intermediate and find where prover/verifier diverge."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from aztec_tpu.ff import FR, limb
from aztec_tpu.ff.bn254 import FR_MOD
from aztec_tpu.numeric.bigint import limbs_to_ints
from aztec_tpu.plonk.composer import AddTriple, UltraComposer
from aztec_tpu.plonk.lookup_tables import range_table, compress_row, build_sorted_halves
from aztec_tpu.utils import setup_compile_cache

setup_compile_cache()
M = FR_MOD

def host(arr):
    return limbs_to_ints(np.asarray(limb.from_mont(arr, FR)))

c = UltraComposer()
c.add_lookup_table(range_table(4, index=1))
for v in (0, 3, 15, 9):
    idx = c.add_variable(v)
    c.create_lookup_gate(idx, c.zero_idx, c.zero_idx, 1)
a = c.add_variable(3); b = c.add_variable(9); s = c.add_variable(12)
c.create_add_gate(AddTriple(a, b, s, 1, 1, -1, 0))

prover = c.create_prover()

# deterministic "randomness" for reproducibility
prover.rng = lambda: 1

proof = prover.construct_proof()
t = prover.transcript
n = prover.n
m = n - 4
print("n =", n)

eta = t.get_challenge_fr("eta")
beta = t.get_challenge_fr("beta", 0)
gamma = t.get_challenge_fr("beta", 1)

# host polys
w = [host(prover.wires_lagrange[f"w_{i}"]) for i in range(1, 5)]
pk = prover.key
ql = host(pk.selectors["q_lookup"].lagrange)
qi = host(pk.selectors["q_index"].lagrange)
tb = [host(pk.selectors[f"table_{i}"].lagrange) for i in range(1, 5)]
h1 = host(prover.wires_lagrange["s_1"])
h2 = host(prover.wires_lagrange["s_2"])

F = [ql[i] * ((w[0][i] + eta * (w[1][i] + eta * (w[2][i] + eta * qi[i]))) % M) % M for i in range(n)]
T = [(tb[0][i] + eta * (tb[1][i] + eta * (tb[2][i] + eta * tb[3][i]))) % M for i in range(n)]

# expected sorted halves
eh1, eh2 = build_sorted_halves([c.tables[1]], c._lookups, eta, m)
print("h1 match (rows 0..m):", h1[:m+1] == eh1)
print("h2 match (rows 0..m-1):", h2[:m] == eh2)

# host grand product
opb = (1 + beta) % M
gpb = gamma * opb % M
z = [1]
for i in range(n - 1):
    num = opb * ((gamma + F[i]) % M) % M * ((T[i] + beta * T[(i+1) % n] + gpb) % M) % M
    den = (h1[i] + beta * h2[i] + gpb) % M * ((h2[i] + beta * h1[(i+1) % n] + gpb) % M) % M
    z.append(z[-1] * num % M * pow(den, -1, M) % M)
print("host z_l[m] == 1:", z[m] == 1)

# device z_lookup poly (lagrange via fft of mono)
from aztec_tpu.poly import fft_ops as pfft
zl_dev = host(pfft.fft(prover.wire_mono["z_lookup"], pk.small_domain))
print("device z_l[:m+1] == host:", zl_dev[:m+1] == z[:m+1])

# identity per row (with device z values incl blinding)
bad = [i for i in range(m)
       if (zl_dev[(i+1) % n] * ((h1[i] + beta * h2[i] + gpb) % M) % M * ((h2[i] + beta * h1[(i+1) % n] + gpb) % M)
           - zl_dev[i] * opb % M * ((gamma + F[i]) % M) % M * ((T[i] + beta * T[(i+1) % n] + gpb) % M)) % M != 0]
print("identity violations in [0,m):", bad[:10], "count", len(bad))

# verifier-side t reconstruction vs prover t_eval
zeta = t.get_challenge_fr("z")
from aztec_tpu.poly.arithmetic import get_lagrange_evaluations, compute_public_input_delta
vanishing, l_start, l_end = get_lagrange_evaluations(zeta, n, pk.small_domain.root, 4)
ev = {}
sset = prover.settings
for info in sset.polynomial_manifest:
    ev[info.polynomial_label] = t.get_element_fr(info.polynomial_label)
    if info.requires_shifted_evaluation:
        ev[info.polynomial_label + "_omega"] = t.get_element_fr(info.polynomial_label + "_omega")
delta = compute_public_input_delta(prover.public_values, beta, gamma, pk.small_domain.root)
ch = {"alpha": t.get_challenge_fr("alpha"), "beta": beta, "gamma": gamma,
      "zeta": zeta, "eta": eta}
recon = prover.flavor.verifier_t_contribution(ev, ch, l_start, l_end, delta)
recon = recon * pow(vanishing, -1, M) % M
t_eval = t.get_element_fr("t")
print("t_eval match:", recon == t_eval)

# break the reconstruction into parts
from aztec_tpu.plonk.flavors import TurboFlavor, _perm_t_contribution, UltraFlavor
tp = _perm_t_contribution(ev, ch, l_start, l_end, delta, 4, use_linearisation=False)
tnl = TurboFlavor._nonlinear_t_terms(ev, ch)
tsel = sum(sc * ev[k] % M for k, sc in UltraFlavor.selector_linear_scalars(ev, ch).items()) % M
tlk = UltraFlavor._lookup_t_terms(ev, ch, l_start, l_end)
print("parts:", [hex(x)[:14] for x in (tp, tnl, tsel, tlk)])
turbo_only = (tp + tnl + tsel) % M
print("turbo-only == t_eval:", turbo_only * pow(vanishing, -1, M) % M == t_eval)
print("lookup part zero?:", tlk == 0)

# ---- bisect: host-evaluate the identity at zeta from monomials -------------
def poly_eval(mono_arr, x):
    cs = host(mono_arr)
    acc = 0
    for cf in reversed(cs):
        acc = (acc * x + cf) % M
    return acc

root = pk.small_domain.root
zw = zeta * root % M
pe = {}
for i in range(1, 5):
    pe[f"w_{i}"] = poly_eval(prover.wire_mono[f"w_{i}"], zeta)
    pe[f"w_{i}_omega"] = poly_eval(prover.wire_mono[f"w_{i}"], zw)
    pe[f"sigma_{i}"] = poly_eval(pk.sigmas[f"sigma_{i}"].monomial, zeta)
    pe[f"table_{i}"] = poly_eval(pk.selectors[f"table_{i}"].monomial, zeta)
    pe[f"table_{i}_omega"] = poly_eval(pk.selectors[f"table_{i}"].monomial, zw)
for q in ("q_m","q_1","q_2","q_3","q_4","q_5","q_c","q_arith","q_ecc_1",
          "q_range","q_logic","q_lookup","q_index"):
    pe[q] = poly_eval(pk.selectors[q].monomial, zeta)
pe["z"] = poly_eval(prover.wire_mono["z"], zeta)
pe["z_omega"] = poly_eval(prover.wire_mono["z"], zw)
pe["z_lookup"] = poly_eval(prover.wire_mono["z_lookup"], zeta)
pe["z_lookup_omega"] = poly_eval(prover.wire_mono["z_lookup"], zw)
pe["s_1"] = poly_eval(prover.wire_mono["s_1"], zeta)
pe["s_1_omega"] = poly_eval(prover.wire_mono["s_1"], zw)
pe["s_2"] = poly_eval(prover.wire_mono["s_2"], zeta)

print("transcript evals match host evals:",
      all(ev[k] == pe[k] for k in ev if k in pe),
      [k for k in ev if k in pe and ev[k] != pe[k]])

# full verifier formula on HOST evals
recon2 = prover.flavor.verifier_t_contribution(pe, ch, l_start, l_end, delta)
tq_at_zeta = poly_eval(prover.quotient_mono, zeta)
print("host recon * Z^-1 == t(zeta) poly:",
      recon2 * pow(vanishing, -1, M) % M == tq_at_zeta)
print("t_eval element == t(zeta) poly:", t_eval == tq_at_zeta)

# lookup-only identity at zeta, host side
F_z = pe["q_lookup"] * ((pe["w_1"] + eta*(pe["w_2"] + eta*(pe["w_3"] + eta*pe["q_index"]))) % M) % M
T_z = (pe["table_1"] + eta*(pe["table_2"] + eta*(pe["table_3"] + eta*pe["table_4"]))) % M
Tw_z = (pe["table_1_omega"] + eta*(pe["table_2_omega"] + eta*(pe["table_3_omega"] + eta*pe["table_4_omega"]))) % M
num_z = opb * ((gamma + F_z) % M) % M * ((T_z + beta*Tw_z + gpb) % M) % M * pe["z_lookup"] % M
den_z = (pe["s_1"] + beta*pe["s_2"] + gpb) % M * ((pe["s_2"] + beta*pe["s_1_omega"] + gpb) % M) % M * pe["z_lookup_omega"] % M
alpha = ch["alpha"]
lk_z = ((num_z - den_z) * pow(alpha,21,M) + (pe["z_lookup"]-1)*l_start%M*pow(alpha,22,M) + (pe["z_lookup_omega"]-1)*l_end%M*pow(alpha,23,M)) % M

# now the turbo part from host evals
from aztec_tpu.plonk.flavors import UnrolledTurboFlavor
turbo_z = UnrolledTurboFlavor.verifier_t_contribution(pe, ch, l_start, l_end, delta)
print("turbo_z + lk_z == t(zeta)*Z:",
      (turbo_z + lk_z) % M == tq_at_zeta * vanishing % M)
print("turbo part alone == t*Z:", turbo_z == tq_at_zeta * vanishing % M)
print("lk_z:", hex(lk_z)[:16])

# ---- kernel-level bisection: turbo part vs lookup part ----------------------
from aztec_tpu.plonk import kernels as K
from aztec_tpu.plonk.proving_key import fr_mont
import jax.numpy as jnp2

num_alphas = 24
alpha_i = ch["alpha"]
ch_mont = {
    "alphas": jnp2.stack([fr_mont(pow(alpha_i, k, M)) for k in range(1, num_alphas+1)], axis=1),
    "beta": fr_mont(beta)[:, None], "gamma": fr_mont(gamma)[:, None],
    "delta": fr_mont(delta)[:, None], "eta": fr_mont(eta)[:, None],
}
wffts = jnp2.stack([prover.wire_fft[f"w_{i}"] for i in range(1, 5)], axis=1)
sffts = jnp2.stack([pk.sigmas[f"sigma_{i}"].fft for i in range(1, 5)], axis=1)
qffts = jnp2.stack([pk.selectors[q].fft for q in prover.flavor.SELECTOR_ORDER], axis=1)
tffts = jnp2.stack([pk.selectors[f"table_{i}"].fft for i in range(1, 5)], axis=1)

turbo_ev = K.turbo_quotient(wffts, sffts, prover.wire_fft["z"], qffts,
                            pk.l1_fft, pk.coset_pts, pk.vanish_scale,
                            ch_mont["alphas"], ch_mont["beta"], ch_mont["gamma"],
                            ch_mont["delta"], n)
t_turbo = pfft.coset_ifft(turbo_ev, pk.large_domain)
t_turbo_z = poly_eval(t_turbo, zeta)
print("turbo kernel t(zeta)*Z == turbo_z host:", t_turbo_z * vanishing % M == turbo_z)

lk_kernel_z = (tq_at_zeta - t_turbo_z) % M * vanishing % M
print("lookup kernel part*Z == lk_z host:", lk_kernel_z == lk_z)
print("lk kernel:", hex(lk_kernel_z)[:16], "lk host:", hex(lk_z)[:16])
