"""Model surgery: the nnet3-copy --edits mini-language.

Parity with reference src/nnet3/nnet-utils.cc ReadEditConfig, which edits a
loaded model from semicolon/newline-separated directives.  Supported here
(the operations that are meaningful for this architecture — there are no
free-floating graph nodes to rename because XLA is the compiler,
SURVEY.md §7.2 M6):

  set-learning-rate-factor [name=<glob>] learning-rate-factor=<f>
      Per-layer LR factors, matched against the top-level flax param
      collection names ('output', 'prefinal', 'tdnn0', 'tdnnf1', ...).
      Stored on the model and applied by the trainer's optimizer chain.
  set-learning-rate [name=<glob>] learning-rate=<f>
      Reference semantics is an absolute LR per component; here an alias
      that records the factor relative to the schedule's base LR of 1.0.
  set-dropout-proportion [name=<glob>] proportion=<p>
      Rewrites the dropout rate in matching layer specs of the config.
  remove-output-nodes name=<glob>
      Accepted and ignored with a warning: the xent-regularizer head here
      is computed from the shared logits (chain/loss.py), so there is no
      separate output node to remove at inference time.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import re
from typing import Dict

from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("edits")


def _parse_kv(tokens):
    out = {}
    for t in tokens:
        if "=" not in t:
            raise KaldiError(f"edit directive token {t!r} is not key=value")
        k, v = t.split("=", 1)
        out[k] = v
    return out


def apply_edits(am: AmNnet, edits: str) -> AmNnet:
    """Apply an edit-config string (directives separated by ';' or
    newlines) and return the edited model."""
    lr_factors: Dict[str, float] = dict(am.lr_factors or {})
    config = am.config
    for line in re.split(r"[;\n]", edits):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        op, *rest = line.split()
        kv = _parse_kv(rest)
        name = kv.get("name", "*")
        if op == "set-learning-rate-factor":
            lr_factors[name] = float(kv["learning-rate-factor"])
        elif op == "set-learning-rate":
            lr_factors[name] = float(kv["learning-rate"])
        elif op == "set-dropout-proportion":
            p = float(kv["proportion"])
            new_layers = []
            n = 0
            for i, spec in enumerate(config.layers):
                lname = f"{spec.kind}{i}"
                if fnmatch.fnmatch(lname, name):
                    new_layers.append(dataclasses.replace(spec, dropout=p))
                    n += 1
                else:
                    new_layers.append(spec)
            config = dataclasses.replace(config, layers=tuple(new_layers))
            log.info("set-dropout-proportion %.3f on %d layers", p, n)
        elif op == "remove-output-nodes":
            log.warning(
                "remove-output-nodes ignored: the xent head shares the "
                "output logits in this architecture")
        else:
            raise KaldiError(f"unknown edit directive {op!r}")
    return AmNnet(config, am.variables, am.log_priors,
                  lr_factors if lr_factors else None)
