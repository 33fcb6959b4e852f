"""On-chip parity check: fused/staged Pallas search vs the XLA oracle path.

CI runs the Pallas kernels in interpret mode only (deterministic ties,
expm1 ELU); this script validates the REAL-TPU branches — exp(x)-1 ELU,
per-program PRNG seeding, tie jitter, Mosaic argmax/matmul semantics —
against the XLA path on hardware (ADVICE r1 #4).

The oracle runs at jax.default_matmul_precision("highest"): the kernels
compute exact f32 (selection dots at Precision.HIGHEST), while XLA's
DEFAULT f32 mode on the MXU is bf16 passes and itself drifts ~6% of visit
entries from the f32 search. Two real-TPU bugs this caught: Mosaic argmax
returns the LAST max index on ties (XLA: first), and default-precision
selection matmuls truncating priors/hiddens to bf16.

Checks:
- the deterministic-tie-break fused run must match the f32 oracle
  near-exactly (<=1% entries, ELU exp-1 ULP tolerance) with values allclose;
- the deterministic staged run must match EXACTLY (0 mismatched entries):
  its inference runs in XLA with the same ELU as the oracle, so no tolerance
  is warranted;
- the jittered (production) run resolves exact ties uniformly at random —
  the reference's own semantics (self_play.py:371-377) — so it legitimately
  diverges from the deterministic oracle at sim-0 root ties; it is checked
  on invariants (visit sums, legality masking) and loose value agreement.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_parity.py
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from muzero_general_tpu.games.cartpole import MuZeroConfig
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.ops import mcts as M
    from muzero_general_tpu.ops import mcts_fused as F

    if jax.default_backend() == "cpu":
        print("tpu_parity: needs a real accelerator backend", file=sys.stderr)
        return 1

    cfg = MuZeroConfig()
    cfg.num_simulations = 50
    B = 64
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(5), (B, 1, 1, 4))
    legal = np.ones((B, 2), bool)
    legal[1, 0] = False
    legal = jnp.asarray(legal)
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(3)

    def xla_search(deterministic, use_pallas=False):
        spec = M.SearchSpec.from_config(
            cfg, batch_size=B if use_pallas else None
        )._replace(deterministic_tie_break=deterministic, use_pallas=use_pallas)
        with jax.default_matmul_precision("highest"):
            return M.run_mcts(
                lambda o: runner.initial_inference(variables, o),
                lambda h, a: runner.recurrent_inference(variables, h, a),
                obs, legal, to_play, rng, spec, add_exploration_noise=True,
            )

    failures = []

    # ---- 1. deterministic ties: fused must match the f32 oracle ----------
    ref = xla_search(deterministic=True)
    fspec = F.FusedSpec.from_config(cfg, deterministic_tie_break=True)
    # The kernel's ROOT seeding is an XLA initial_inference call — run it at
    # highest precision too so the comparison isolates the kernel itself.
    with jax.default_matmul_precision("highest"):
        got = F.run_mcts_fused(
            lambda o: runner.initial_inference(variables, o),
            variables, obs, legal, to_play, rng, fspec,
            add_exploration_noise=True,
        )
    v_ref = np.asarray(ref.root_visit_counts)
    v_got = np.asarray(got.root_visit_counts)
    mismatch = float((v_ref != v_got).mean())
    if mismatch > 0.01:  # exp(x)-1 vs expm1 ELU ULP noise only
        failures.append(f"deterministic fused visit mismatch frac={mismatch:.3f}")
    if not np.allclose(
        np.asarray(ref.root_value), np.asarray(got.root_value), atol=1e-3,
        rtol=1e-4,
    ):
        failures.append("deterministic fused root values diverge")

    # ---- 2. deterministic staged Pallas path ------------------------------
    got_p = xla_search(deterministic=True, use_pallas=True)
    vp = np.asarray(got_p.root_visit_counts)
    mismatch_p = float((v_ref != vp).mean())
    if mismatch_p > 0.0:
        failures.append(f"deterministic staged visit mismatch frac={mismatch_p:.3f}")
    if not np.allclose(
        np.asarray(ref.root_value), np.asarray(got_p.root_value), atol=1e-5
    ):
        failures.append("deterministic staged root values diverge")

    # ---- 3. jittered (production) run: invariants + loose values ---------
    fspec_j = F.FusedSpec.from_config(cfg)  # real PRNG jitter path
    with jax.default_matmul_precision("highest"):
        got_j = F.run_mcts_fused(
            lambda o: runner.initial_inference(variables, o),
            variables, obs, legal, to_play, rng, fspec_j,
            add_exploration_noise=True,
        )
    vj = np.asarray(got_j.root_visit_counts)
    if not (vj.sum(-1) == cfg.num_simulations).all():
        failures.append("jittered visits do not sum to num_simulations")
    if vj[1, 0] != 0:
        failures.append("masked root action got visits (jittered)")
    dv = np.abs(np.asarray(got_j.root_value) - np.asarray(ref.root_value))
    if float(dv.mean()) > 0.1 or float(dv.max()) > 0.6:
        failures.append(
            f"jittered root values too far from oracle "
            f"(mean {dv.mean():.3f}, max {dv.max():.3f})"
        )
    # Uniform tie resolution: at sim 0 every root pUCT score ties, so across
    # lanes the jittered path must not systematically copy the oracle's
    # first-index choice NOR always avoid it.
    exact = float((vj == v_ref).mean())

    # ---- 4. INFORMATIONAL: lower network-precision tiers ------------------
    # (config.fused_net_precision; selection dots stay HIGHEST at every
    # tier.) Divergence from the f32 oracle is EXPECTED here — these lines
    # quantify the accuracy cost of the faster tiers for RESULTS.md; they
    # never fail the check.
    tier_report = {}
    for tier in ("default",):
        fspec_t = F.FusedSpec.from_config(
            cfg, deterministic_tie_break=True
        )._replace(net_precision=tier)
        with jax.default_matmul_precision("highest"):
            got_t = F.run_mcts_fused(
                lambda o: runner.initial_inference(variables, o),
                variables, obs, legal, to_play, rng, fspec_t,
                add_exploration_noise=True,
            )
        vt = np.asarray(got_t.root_visit_counts)
        dvt = np.abs(np.asarray(got_t.root_value) - np.asarray(ref.root_value))
        tier_report[tier] = (
            float((v_ref != vt).mean()), float(dvt.mean()), float(dvt.max())
        )

    # ---- 5. HBM-streaming descend (big-board path) on real Mosaic --------
    # Gomoku-shaped shapes at a reduced sim budget: the deterministic stream
    # run must match the deterministic staged XLA search EXACTLY (same
    # zero-jitter tie rule, same fold math on the packed slab).
    from muzero_general_tpu.games.gomoku import MuZeroConfig as GomokuCfg

    gcfg = GomokuCfg()
    gcfg.num_simulations = 48
    Bg = 16
    grunner = MuZeroNetwork(gcfg)
    gvars = grunner.init(jax.random.PRNGKey(1))
    gobs = jax.random.normal(
        jax.random.PRNGKey(6), (Bg,) + grunner.stacked_observation_shape()
    )
    Ag = len(gcfg.action_space)
    glegal = np.ones((Bg, Ag), bool)
    glegal[2, :5] = False
    glegal = jnp.asarray(glegal)
    gtp = jnp.zeros((Bg,), jnp.int32)

    def gsearch(use_stream):
        spec = M.SearchSpec.from_config(gcfg, batch_size=Bg)._replace(
            deterministic_tie_break=True, use_pallas=False,
            use_stream=use_stream,
        )
        with jax.default_matmul_precision("highest"):
            return M.run_mcts(
                lambda o: grunner.initial_inference(gvars, o),
                lambda h, a: grunner.recurrent_inference(gvars, h, a),
                gobs, glegal, gtp, rng, spec, add_exploration_noise=True,
            )

    gref = gsearch(False)
    gstr = gsearch(True)
    gv_ref = np.asarray(gref.root_visit_counts)
    gv_str = np.asarray(gstr.root_visit_counts)
    stream_mismatch = float((gv_ref != gv_str).mean())
    if stream_mismatch > 0.0:
        failures.append(
            f"deterministic STREAM visit mismatch frac={stream_mismatch:.3f}"
        )
    if not np.allclose(
        np.asarray(gref.root_value), np.asarray(gstr.root_value), atol=1e-4
    ):
        failures.append("deterministic stream root values diverge")

    if failures:
        print("tpu_parity FAIL:", "; ".join(failures))
        return 1
    print(
        f"tpu_parity OK: deterministic fused {1 - mismatch:.1%} exact / "
        f"staged {1 - mismatch_p:.1%} exact / stream "
        f"{1 - stream_mismatch:.1%} exact vs f32 oracle; jittered run "
        f"{exact:.1%} exact (ties resolve randomly, by design), value gap "
        f"mean {dv.mean():.4f}"
    )
    for tier, (mm, dm, dx) in tier_report.items():
        print(
            f"tpu_parity info: net_precision={tier}: visit mismatch "
            f"{mm:.1%}, root value gap mean {dm:.4f} max {dx:.4f} "
            f"(informational — divergence expected below 'highest')"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
