"""xconfig front-end: the recipes' layer DSL → TdnnConfig.

Reference parity (SURVEY.md §5 config tier 3):
steps/libs/nnet3/xconfig/{parser,layers}.py + steps/nnet3/
xconfig_to_configs.py.  The reference compiles xconfig lines to the nnet3
Descriptor .config text; here they compile to a TdnnConfig whose layers the
flax TdnnModel executes directly (XLA is the computation compiler —
SURVEY.md §7.2 M6).

Supported layer types (the ones the BASELINE recipes use):
  input name=input dim=D
  relu-batchnorm-layer / relu-renorm-layer  name=.. dim=D [input=Append(..)]
  tdnnf-layer   name=.. dim=D bottleneck-dim=B time-stride=S [dropout-proportion=..]
  fast-lstmp-layer / lstmp-layer  name=.. cell-dim=C recurrent-projection-dim=R
        [non-recurrent-projection-dim=N]
  blstmp-layer  (bidirectional variant)
  attention-relu-renorm-layer  name=.. num-heads=H key-dim=K value-dim=V
        num-left-inputs=L num-right-inputs=R [time-stride=S]
  conv-relu-batchnorm-layer  name=.. height-in=H height-out=H' num-filters-out=F
        [time-offsets=-1,0,1] [height-offsets=-1,0,1]   (CNN-TDNN front-end)
  prefinal-layer name=.. dim=D        (reference prefinal-l / prefinal chain pieces)
  output-layer  name=output dim=NumPdfs

`input=Append(-2,-1,0,1,2)` splicing offsets apply to the previous layer
(sequential stacks only — the reference's arbitrary DAG references, e.g.
skip connections by name, are not wired; the recipes in scope are chains).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from old_kaldi_git_tpu.models.tdnn import TdnnConfig, TdnnLayerSpec
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("xconfig")


def _parse_line(line: str) -> Tuple[str, Dict[str, str]]:
    parts = line.split()
    kind = parts[0]
    kv: Dict[str, str] = {}
    for tok in parts[1:]:
        if "=" not in tok:
            raise KaldiError(f"xconfig: bad token {tok!r} in {line!r}")
        k, v = tok.split("=", 1)
        kv[k] = v
    return kind, kv


def _offsets(kv: Dict[str, str]) -> Tuple[int, ...]:
    inp = kv.get("input", "")
    if not inp:
        return (0,)
    m = re.fullmatch(r"Append\(([-0-9,\s]+)\)", inp)
    if m:
        return tuple(int(x) for x in m.group(1).replace(" ", "").split(","))
    m = re.fullmatch(r"Offset\([^,]+,\s*(-?\d+)\)", inp)
    if m:
        return (int(m.group(1)),)
    # a plain layer-name reference = the previous layer, no splicing
    if re.fullmatch(r"[A-Za-z0-9_.\-]+", inp):
        return (0,)
    raise KaldiError(f"xconfig: unsupported input descriptor {inp!r}")


def parse_xconfig(text: str) -> TdnnConfig:
    input_dim = -1
    num_outputs = -1
    final_hidden = 0
    layers: List[TdnnLayerSpec] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        kind, kv = _parse_line(line)
        if kind == "input":
            input_dim = int(kv["dim"])
        elif kind in ("relu-batchnorm-layer", "relu-renorm-layer",
                      "relu-batchnorm-dropout-layer"):
            layers.append(
                TdnnLayerSpec(
                    "tdnn", int(kv["dim"]), _offsets(kv),
                    dropout=float(kv.get("dropout-proportion", 0.0)),
                )
            )
        elif kind == "tdnnf-layer":
            layers.append(
                TdnnLayerSpec(
                    "tdnnf", int(kv["dim"]),
                    bottleneck_dim=int(kv["bottleneck-dim"]),
                    time_stride=int(kv.get("time-stride", 1)),
                    bypass_scale=float(kv.get("bypass-scale", 0.66)),
                    dropout=float(kv.get("dropout-proportion", 0.0)),
                )
            )
        elif kind in ("fast-lstmp-layer", "lstmp-layer", "blstmp-layer"):
            cell = int(kv["cell-dim"])
            rec = int(kv.get("recurrent-projection-dim", max(1, cell // 4)))
            nonrec = int(kv.get("non-recurrent-projection-dim", 0))
            layers.append(
                TdnnLayerSpec(
                    "blstmp" if kind.startswith("b") else "lstmp", cell,
                    recurrent_dim=rec, nonrecurrent_dim=nonrec,
                )
            )
        elif kind in ("pgru-layer", "norm-pgru-layer", "gru-layer"):
            cell = int(kv["cell-dim"])
            rec = int(kv.get("recurrent-projection-dim", max(1, cell // 4)))
            nonrec = int(kv.get("non-recurrent-projection-dim", 0))
            layers.append(
                TdnnLayerSpec("pgru", cell,
                              recurrent_dim=rec, nonrecurrent_dim=nonrec)
            )
        elif kind in ("attention-relu-renorm-layer", "attention-layer"):
            layers.append(
                TdnnLayerSpec(
                    "attention", 0,
                    num_heads=int(kv.get("num-heads", 4)),
                    key_dim=int(kv.get("key-dim", 40)),
                    value_dim=int(kv.get("value-dim", 60)),
                    num_left_inputs=int(kv.get("num-left-inputs", 5)),
                    num_right_inputs=int(kv.get("num-right-inputs", 2)),
                    time_stride=int(kv.get("time-stride", 1)),
                )
            )
        elif kind in ("conv-relu-batchnorm-layer", "conv-layer"):
            h_in = int(kv["height-in"])
            h_out = int(kv.get("height-out", h_in))
            sub = max(1, round(h_in / max(1, h_out)))
            t_off = tuple(int(x) for x in kv.get(
                "time-offsets", "-1,0,1").split(","))
            h_off = tuple(int(x) for x in kv.get(
                "height-offsets", "-1,0,1").split(","))
            layers.append(
                TdnnLayerSpec(
                    "conv", int(kv["num-filters-out"]), t_off,
                    height_in=h_in, height_offsets=h_off,
                    height_subsample=sub,
                )
            )
        elif kind == "prefinal-layer":
            final_hidden = int(kv["dim"])
        elif kind == "output-layer":
            num_outputs = int(kv["dim"])
        else:
            raise KaldiError(f"xconfig: unsupported layer type {kind!r}")
    if input_dim <= 0:
        raise KaldiError("xconfig: missing 'input' line with dim")
    if num_outputs <= 0:
        raise KaldiError("xconfig: missing 'output-layer' line with dim")
    cfg = TdnnConfig(
        input_dim, num_outputs, tuple(layers), final_hidden_dim=final_hidden
    )
    log.info(
        "xconfig: %d layers, context -%d/+%d, %d outputs",
        len(layers), cfg.left_context, cfg.right_context, num_outputs,
    )
    return cfg
