"""Language annotation bank: natural-language paraphrases per CALVIN task.

Role of the reference's sentence bank (conf/annotations/new_playtable.yaml,
consumed by hulc2/utils/automatic_lang_annotator_mp.py). Paraphrases here are
this framework's own phrasings; extend freely — samplers draw uniformly.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from hulc2_tpu.evaluation.tasks import COLORS, TASK_NAMES


def _block_phrases(verb: str, color: str, direction: str = None) -> List[str]:
    obj = f"the {color} block"
    if verb == "rotate":
        return [
            f"rotate {obj} to the {direction}",
            f"turn {obj} {direction}",
            f"spin {obj} towards the {direction}",
        ]
    if verb == "push":
        return [
            f"push {obj} to the {direction}",
            f"slide {obj} {direction}",
            f"move {obj} to the {direction}",
        ]
    raise ValueError(verb)


def build_annotation_bank() -> Dict[str, List[str]]:
    bank: Dict[str, List[str]] = {}
    for verb in ("rotate", "push"):
        for c in COLORS:
            for d in ("right", "left"):
                bank[f"{verb}_{c}_block_{d}"] = _block_phrases(verb, c, d)
    bank["move_slider_left"] = ["move the sliding door to the left", "push the slider left",
                                "slide the door to the left side"]
    bank["move_slider_right"] = ["move the sliding door to the right", "push the slider right",
                                 "slide the door to the right side"]
    bank["open_drawer"] = ["open the drawer", "pull the drawer open", "pull the handle of the drawer"]
    bank["close_drawer"] = ["close the drawer", "push the drawer shut", "push the drawer closed"]
    for c in COLORS:
        bank[f"lift_{c}_block_table"] = [
            f"pick up the {c} block from the table",
            f"lift the {c} block off the table",
            f"grab the {c} block on the table",
        ]
        bank[f"lift_{c}_block_slider"] = [
            f"pick up the {c} block from the shelf",
            f"take the {c} block out of the slider",
            f"grab the {c} block from the sliding cabinet",
        ]
        bank[f"lift_{c}_block_drawer"] = [
            f"pick up the {c} block from the drawer",
            f"take the {c} block out of the drawer",
        ]
    bank["place_in_slider"] = ["put the block in the slider", "store the block in the sliding cabinet",
                               "place the grasped block on the shelf"]
    bank["place_in_drawer"] = ["put the block in the drawer", "store the block in the drawer",
                               "drop the grasped block into the drawer"]
    bank["stack_block"] = ["stack the block on top of another block", "place the block on another block",
                           "put the grasped block on top of a block"]
    bank["unstack_block"] = ["take off the stacked block", "remove the block from the stack",
                             "unstack the blocks"]
    bank["turn_on_lightbulb"] = ["turn on the light bulb", "move the switch up to turn on the bulb",
                                 "switch on the yellow light"]
    bank["turn_off_lightbulb"] = ["turn off the light bulb", "move the switch down to turn off the bulb",
                                  "switch off the yellow light"]
    bank["turn_on_led"] = ["turn on the led", "press the button to switch on the led",
                           "push the button to turn on the green light"]
    bank["turn_off_led"] = ["turn off the led", "press the button to switch off the led",
                            "push the button to turn off the green light"]
    bank["push_into_drawer"] = ["push the block into the drawer", "sweep the block into the open drawer",
                                "slide the block off the table into the drawer"]
    assert set(bank) == set(TASK_NAMES)
    return bank


ANNOTATION_BANK = build_annotation_bank()


def build_validation_bank() -> Dict[str, str]:
    """One canonical instruction per task for the validation split.

    Role of the reference's validation sentence bank
    (conf/annotations/new_playtable_validation.yaml, bound via
    ``annotations@val_instructions`` in conf/lang_ann.yaml:10): validation
    windows and the evaluation ``embeddings.npy`` lookup use a single fixed
    phrasing per task so val metrics are not confounded by paraphrase
    sampling. Phrasings are this framework's own.
    """
    bank = {t: opts[0] for t, opts in ANNOTATION_BANK.items()}
    assert set(bank) == set(TASK_NAMES)
    return bank


VALIDATION_BANK = build_validation_bank()


def sample_annotation(task: str, rng: np.random.Generator, validation: bool = False) -> str:
    if validation:
        return VALIDATION_BANK[task]
    options = ANNOTATION_BANK[task]
    return options[int(rng.integers(len(options)))]
