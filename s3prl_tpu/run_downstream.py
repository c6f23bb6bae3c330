"""Legacy-style CLI shim: `python -m s3prl_tpu.run_downstream -m train -u hubert -d sid`.

The reference's workhorse entry (s3prl/run_downstream.py:19-150) drives 41
downstream folders with `-m mode -u upstream -d downstream`. This shim maps
those flags onto the problem layer so reference users keep their muscle
memory; `-o` dotted overrides are honored (utility/helper.py:71-99 syntax).
"""

from __future__ import annotations

import argparse
import logging

from .problem.base import Problem
from . import problem as _registry  # noqa: F401
from .util.config import parse_override_string, set_dotted

logging.basicConfig(level=logging.INFO)

# legacy -d names -> problem classes
DOWNSTREAM_TO_PROBLEM = {
    "asr": "SuperbASR",
    "ctc": "SuperbASR",
    "phone_linear": "SuperbPR",
    "timit_phone": "SuperbPR",
    "pr": "SuperbPR",
    "speech_commands": "SuperbKS",
    "ks": "SuperbKS",
    "fluent_commands": "SuperbIC",
    "ic": "SuperbIC",
    "voxceleb1": "SuperbSID",
    "sid": "SuperbSID",
    "sv_voxceleb1": "SuperbASV",
    "asv": "SuperbASV",
    "emotion": "SuperbER",
    "er": "SuperbER",
    "diarization": "SuperbSD",
    "sd": "SuperbSD",
    "snips": "SuperbSF",
    "sf": "SuperbSF",
    "example": "CommonExample",
}


def get_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-m", "--mode", choices=["train", "evaluate", "inference"], default="train"
    )
    parser.add_argument("-u", "--upstream", default="fbank")
    parser.add_argument("-d", "--downstream", required=True)
    parser.add_argument("-p", "--expdir", required=True, help="target dir")
    parser.add_argument("-k", "--upstream_ckpt", default=None)
    parser.add_argument("-s", "--upstream_feature_selection", default=None)
    parser.add_argument("-o", "--override", default="", help="a.b=c,,d.e=f overrides")
    parser.add_argument(
        "-t", "--evaluate_split", default="test",
        help="in inference mode: path to a single audio file (reference "
        "runner.py:506-524 reuses this flag for the input file)",
    )
    # reference semantics: resume is OPT-IN via -a (run_downstream.py:93-107);
    # without it a stale expdir starts training from scratch
    parser.add_argument("-a", "--auto_resume", action="store_true", default=False)
    # reference run_downstream.py:77-78: publish the trained experiment to
    # the Hugging Face Hub (train/hub_export.py; upload is egress-gated,
    # staging always happens)
    parser.add_argument("--push_to_hf_hub", action="store_true", default=False)
    parser.add_argument("--hf_hub_org", default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    name = DOWNSTREAM_TO_PROBLEM.get(args.downstream)
    if name is None:
        raise SystemExit(
            f"unknown downstream '{args.downstream}'; known: {sorted(DOWNSTREAM_TO_PROBLEM)}"
        )
    cls = Problem.get_class_from_name(name)
    problem = cls()
    config = problem.default_config()
    config["target_dir"] = args.expdir
    set_dotted(config, "build_upstream.name", args.upstream)
    if args.upstream_ckpt:
        set_dotted(config, "build_upstream.ckpt", args.upstream_ckpt)
    for key, value in _flatten(parse_override_string(args.override)):
        set_dotted(config, key, value)
    config.setdefault("train", {})["auto_resume"] = bool(args.auto_resume)
    target_dir = config.pop("target_dir")
    if args.mode == "train":
        result = problem.run(target_dir, **config)
        if args.push_to_hf_hub:
            from .train.hub_export import push_to_hub

            push_to_hub(
                target_dir, upstream=args.upstream, problem=name,
                organization=args.hf_hub_org,
            )
        return result
    if args.mode == "inference":
        from pathlib import Path

        return problem.inference(Path(target_dir), config, args.evaluate_split)
    # evaluate: skip prepare/encode/train stages
    n_stages = len(problem.STAGES)
    return problem.run(target_dir, start=n_stages - 1, **config)


def _flatten(d, prefix=""):
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, v


if __name__ == "__main__":
    main()
