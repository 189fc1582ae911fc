"""Resolve and pretty-print a config (reference scripts/print_config.py)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description="Print the resolved config")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--save_path", default=None, help="optionally dump the resolved config here")
    parser.add_argument(
        "--cfg_options",
        nargs="+",
        action=DictAction,
        help="override settings in the config via key=value pairs",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)
    print(f"Config:\n{cfg.pretty_text}")
    if args.save_path is not None:
        cfg.dump(args.save_path)
        print(f"Saved to {args.save_path}")


if __name__ == "__main__":
    main()
