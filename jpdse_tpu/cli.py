"""CLI flag surface.

Exposes every config field as a ``--flag`` with the reference's names
(base_parser.py:33-130 + pix2pixHD_model.py:22-102), by walking the nested
config dataclasses and registering each leaf under its bare field name
(``--num_labels`` -> data.num_labels, ``--no_label_encoding`` ->
model.no_label_encoding, ...). The three preprocess blocks keep the
reference's ``--preprocess_mode`` / ``--val_*`` / ``--test_*`` prefix scheme.

``--load_opt --opt_file run/opt.json`` reloads a saved config as new defaults,
overridable by explicit flags — the same round trip the reference's test
script relies on (base_parser.py:153-156, scripts/pix2pixHD_bpg_test.sh).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import Dict, List, Optional, Tuple

from jpdse_tpu.config import (
    Config,
    PreprocessConfig,
    apply_dataset_defaults,
    get_by_path,
    set_by_path,
)


def str2bool(s) -> bool:
    if isinstance(s, bool):
        return s
    if s.lower() in ("true", "t", "yes", "y", "1"):
        return True
    if s.lower() in ("false", "f", "no", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"cannot interpret {s} as bool")


def _leaf_fields(cls, prefix: str) -> List[Tuple[str, object, str, str]]:
    out = []
    for f in dataclasses.fields(cls):
        default = (
            f.default_factory()  # type: ignore[misc]
            if f.default_factory is not dataclasses.MISSING
            else f.default
        )
        if dataclasses.is_dataclass(default):
            out.extend(_leaf_fields(type(default), f"{prefix}{f.name}."))
        else:
            out.append(
                (f"{prefix}{f.name}", default, str(f.type),
                 f.metadata.get("help", ""))
            )
    return out


def build_flag_index() -> Dict[str, Tuple[str, object, str, str]]:
    """flag name -> (dotted config path, default, type annotation, help)."""
    index: Dict[str, Tuple[str, object, str, str]] = {}
    for dotted, default, typestr, help_ in _leaf_fields(Config, ""):
        parts = dotted.split(".")
        name = parts[-1]
        # preprocess blocks: keep reference naming (val_/test_ prefixes)
        if len(parts) >= 2 and parts[-2] in ("val_preprocess", "test_preprocess"):
            name = parts[-2].split("_")[0] + "_" + name
        if name in index:
            raise RuntimeError(f"ambiguous flag --{name}: {index[name][0]} vs {dotted}")
        index[name] = (dotted, default, typestr, help_)
    return index


def make_parser() -> Tuple[argparse.ArgumentParser, Dict[str, Tuple[str, object]]]:
    index = build_flag_index()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    for name, (dotted, default, typestr, help_) in sorted(index.items()):
        kwargs: dict = {
            "default": None,
            "help": f"{dotted} — {help_}" if help_ else dotted,
        }
        if isinstance(default, bool):
            kwargs.update(type=str2bool, nargs="?", const=True)
        elif isinstance(default, int):
            kwargs.update(type=int)
        elif isinstance(default, float):
            kwargs.update(type=float)
        elif default is None and "int" in typestr:
            kwargs.update(type=int)
        elif default is None and "float" in typestr:
            kwargs.update(type=float)
        elif isinstance(default, tuple):
            kwargs.update(type=str)  # comma-separated, parsed by the config
        else:
            kwargs.update(type=str)
        parser.add_argument(f"--{name}", **kwargs)
    # compatibility / meta flags
    parser.add_argument("--load_opt", action="store_true", help="reload a saved config as defaults")
    parser.add_argument("--opt_file", type=str, default=None, help="saved config json")
    parser.add_argument("--gpu_ids", type=str, default=None, help="ignored (TPU framework); kept for recipe compatibility")
    # reference flags that are dead or hardware-specific there, accepted so
    # reference invocations run unchanged: --data_type 16 selected fp16 label
    # tensors (pix2pixHD_model.py:384-385; bf16 compute covers it here);
    # --local_rank was parsed but never read (pix2pixHD_model.py:55)
    parser.add_argument("--data_type", type=int, default=None, help="ignored (bf16 compute); kept for recipe compatibility")
    parser.add_argument("--local_rank", type=int, default=None, help="ignored (dead flag in the reference); kept for recipe compatibility")
    return parser, index


def parse_config(argv: Optional[List[str]] = None, is_train: bool = True) -> Config:
    argv = sys.argv[1:] if argv is None else argv
    parser, index = make_parser()
    args = parser.parse_args(argv)

    if args.load_opt:
        if not args.opt_file:
            raise SystemExit("--load_opt requires --opt_file")
        cfg = Config.load(args.opt_file)
    else:
        cfg = Config()

    explicitly_set = []
    for name, (dotted, _, _t, _h) in index.items():
        val = getattr(args, name)
        if val is not None:
            set_by_path(cfg, dotted, val)
            explicitly_set.append(dotted)
    if args.gpu_ids is not None:
        print("note: --gpu_ids is ignored; device placement is JAX-managed")

    # normalize string-typed tuples (quality, normalize_mean/std)
    cfg.data.__post_init__()
    cfg.codec.__post_init__()

    apply_dataset_defaults(cfg, explicitly_set)
    cfg.is_train = is_train
    if cfg.mode is None or "mode" not in explicitly_set:
        cfg.mode = "train" if is_train else "test"
    # consistency validation happens at model construction (the reference's
    # defaults are also mutually inconsistent until flags pick a binarization
    # site; it checks in Pix2PixHDModel.__init__, pix2pixHD_model.py:107-108)
    return cfg


def print_config(cfg: Config, title: str = "Options"):
    defaults = Config()
    lines = [f"----------------- {title} ---------------"]
    for dotted, default, _t, _h in _leaf_fields(Config, ""):
        val = get_by_path(cfg, dotted)
        try:
            dflt = get_by_path(defaults, dotted)
        except AttributeError:
            dflt = None
        mark = "" if val == dflt else f"\t[default: {dflt}]"
        lines.append(f"{dotted:>40}: {str(val):<24}{mark}")
    lines.append("----------------- End -------------------")
    print("\n".join(lines))
