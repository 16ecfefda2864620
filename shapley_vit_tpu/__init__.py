"""shapley_vit_tpu — TPU-native Shapley-value contribution scoring for federated ViT.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the reference
`juniarto-samsudin/shapley-vit` (PyTorch/CUDA): federated-learning clients fine-tune
a LoRA-adapted ViT; the Shapley server ingests their weight deltas, FedAvg-aggregates
them per coalition, evaluates each coalition model on a held-out validation set, and
feeds the two-dimensional (accuracy, loss) utilities into a family of Shapley
estimators.

TPU-first inversions vs. the reference (see SURVEY.md §7):
  * the serial per-coalition evaluation loop becomes a *coalition axis*: stacked
    FedAvg-combined weight sets evaluated with one vmapped forward pass;
  * torch state-dict mutation becomes pure functional pytree algebra
    (``init + Σ ratio·delta`` as an einsum over a stacked client axis);
  * accuracy/loss accumulators stay on device until a round completes.

Layer map:
  config     — typed config tree (reference: shapleyserver/opts.py)
  data       — dataset registry, partitioners, OCT loader (federated_learning/utils.py)
  models     — functional ViT + LoRA overlay, model zoo (networks.py, start.py)
  ops        — pytree algebra + Pallas kernels (federated_learning/utils.py aggregation)
  fl         — clients/server/evaluation/ingestion (client2.py, server2.py)
  shapley    — Game + estimators + MILP (fed_client_contribution/)
  parallel   — mesh + sharded coalition evaluation (replaces nn.DataParallel)
  driver     — start() orchestration parity (start.py, mainShapley.py)
"""

__version__ = "0.1.0"
