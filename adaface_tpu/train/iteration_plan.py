"""Host-side iteration planner.

Rebuild of the iteration-type scheduler in `DDPM.training_step`
(`ddpm.py:434-503`): a deterministic round-robin among comp-feat-distill
(every `comp_distill_iter_gap` global steps), unet-distill (every
`unet_distill_iter_gap` non-comp iterations) and normal-recon (the rest),
plus per-(rank, epoch, batch) seeding (`set_seed_per_rank_and_batch`,
`ldm/util.py:524-531`) and the UNet base↔comp weight hot-swap flag.

Each iteration type maps to one pre-jitted step function (SURVEY §7:
"branch-by-schedule"), so the device never sees data-dependent control
flow.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class IterationFlags:
    step: int
    iter_type: str  # 'recon' | 'unet_distill' | 'comp_distill'
    use_comp_distill_weights: bool
    switch_weights: bool  # weights must be hot-swapped before this step
    seed: int
    do_prompt_emb_delta_reg: bool
    num_denoising_steps: int = 1
    # comp iterations alternate 4/3 priming steps (`ddpm.py:2388`:
    # comp_iters_count % 2 - 1 + max_num_comp_priming_denoising_steps)
    num_priming_steps: int = 4


@dataclasses.dataclass
class IterationPlanner:
    comp_distill_iter_gap: int = 0  # 0 = disabled (stage 1)
    unet_distill_iter_gap: int = 0
    do_prompt_emb_delta_reg: bool = True
    has_comp_unet_weights: bool = False
    rank: int = 0
    # distill step-count buckets to bound the number of compiled graphs
    # (SURVEY §7 hard part 3: steps ∈ {2,3,4,5})
    unet_distill_steps_range: tuple[int, int] = (2, 4)
    # max_num_comp_priming_denoising_steps (`ddpm.py:105`)
    max_priming_steps: int = 4

    def __post_init__(self):
        self.non_comp_iters = 0
        self.comp_iters = 0
        self.unet_distill_iters = 0
        self.recon_iters = 0
        self._prev_comp_weights = False

    def seed_for(self, epoch: int, batch_idx: int) -> int:
        return (self.rank * 100_000 + epoch * 10_000 + batch_idx) % (2**31)

    def plan(self, global_step: int, epoch: int = 0,
             batch_idx: int | None = None) -> IterationFlags:
        batch_idx = batch_idx if batch_idx is not None else global_step
        seed = self.seed_for(epoch, batch_idx)
        rng = np.random.RandomState(seed)

        n_prime = 4
        if (self.comp_distill_iter_gap > 0
                and global_step % self.comp_distill_iter_gap == 0):
            iter_type = "comp_distill"
            self.comp_iters += 1
            delta_reg = self.do_prompt_emb_delta_reg
            n_steps = 4
            n_prime = self.comp_iters % 2 - 1 + self.max_priming_steps
        else:
            self.non_comp_iters += 1
            if (self.unet_distill_iter_gap > 0
                    and self.non_comp_iters % self.unet_distill_iter_gap == 0):
                iter_type = "unet_distill"
                self.unet_distill_iters += 1
                delta_reg = False
                n_steps = int(rng.randint(self.unet_distill_steps_range[0],
                                          self.unet_distill_steps_range[1] + 1))
            else:
                iter_type = "recon"
                self.recon_iters += 1
                delta_reg = self.do_prompt_emb_delta_reg
                n_steps = 1

        use_comp_w = (iter_type == "comp_distill"
                      and self.has_comp_unet_weights)
        switch = use_comp_w != self._prev_comp_weights
        self._prev_comp_weights = use_comp_w
        return IterationFlags(
            step=global_step, iter_type=iter_type,
            use_comp_distill_weights=use_comp_w, switch_weights=switch,
            seed=seed, do_prompt_emb_delta_reg=delta_reg,
            num_denoising_steps=n_steps, num_priming_steps=n_prime,
        )
