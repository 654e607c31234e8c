"""Config resolution (reference eval.py:28-35, 82-89, 118-121): JSON files by
name under ``config/{eval,method,dataset}``, searched in the current working
directory first and the repo root second."""

import json
import os

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          os.pardir, os.pardir))


def _find(group, name):
    for base in (os.getcwd(), _REPO_ROOT):
        path = os.path.join(base, "config", group, name + ".json")
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"config/{group}/{name}.json not found in "
                            f"{os.getcwd()} or {_REPO_ROOT}")


def read_json(path):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def get_eval_configs(names):
    out = []
    for name in names:
        cfg = read_json(_find("eval", name))
        cfg["name"] = name
        out.append(cfg)
    return out


def get_dataset_configs(names):
    out = []
    for name in names:
        cfg = read_json(_find("dataset", name))
        cfg["name"] = name
        out.append(cfg)
    return out


def get_method_config(name):
    return read_json(_find("method", name))
