"""Flag parity: every argparse flag of the reference's option classes is
accepted by the corresponding tuch_tpu CLI (BASELINE.json requires the
reference command lines to work unchanged). Scrapes the reference
configs' add_argument calls and probes our parsers.
"""

import os
import re

import pytest

REF_CFG = '/root/reference/configs'

if not os.path.isdir(REF_CFG):  # pragma: no cover
    pytest.skip('reference repo not mounted', allow_module_level=True)


def _ref_flags(fname):
    with open(os.path.join(REF_CFG, fname)) as f:
        src = f.read()
    return sorted(set(re.findall(r"add_argument\('(--[a-z_0-9]+)'", src)))


def _accepted_flags(parser):
    out = set()
    for action in parser._actions:
        out.update(o for o in action.option_strings if o.startswith('--'))
    return out


def _dataclass_parser(cls):
    import argparse
    from tuch_tpu import config as cfg
    parser = argparse.ArgumentParser()
    cfg._add_dataclass_args(parser, cls)
    return parser


def test_train_flags_cover_reference():
    from tuch_tpu import config as cfg
    ours = _accepted_flags(_dataclass_parser(cfg.TrainConfig))
    missing = [f for f in _ref_flags('train_options.py') if f not in ours]
    assert not missing, f'train flags missing vs reference: {missing}'


def test_smplify_dc_flags_cover_reference():
    from tuch_tpu import config as cfg
    ours = _accepted_flags(_dataclass_parser(cfg.SMPLifyDemoConfig))
    missing = [f for f in _ref_flags('smplify_dc_options.py')
               if f not in ours]
    assert not missing, f'smplify_dc flags missing: {missing}'


def test_eft_flags_cover_reference():
    import argparse
    from unittest import mock
    from tuch_tpu.cli import fit_eft

    captured = {}
    real_parse = argparse.ArgumentParser.parse_args

    def grab(self, argv=None):
        captured['flags'] = _accepted_flags(self)
        raise SystemExit(0)

    with mock.patch.object(argparse.ArgumentParser, 'parse_args', grab):
        try:
            fit_eft.main([])
        except SystemExit:
            pass
    missing = [f for f in _ref_flags('eft_fitting_options.py')
               if f not in captured['flags']]
    assert not missing, f'eft flags missing: {missing}'


def test_eft_weight_defaults_match_reference():
    """eft_fitting_options.py:35-37: keypoint 1.0, beta 1.0, contact 10.0
    (wired at fit_eft.py:69-71)."""
    from tuch_tpu.losses.eft import EFTWeights
    w = EFTWeights()
    assert (w.keypoints, w.shape, w.contact) == (1.0, 1.0, 10.0)
    from tuch_tpu import config as cfg
    e = cfg.EFTConfig()
    assert (e.keypoint_loss_weight, e.beta_loss_weight,
            e.contact_loss_weight) == (1.0, 1.0, 10.0)


def test_flag_defaults_match_reference():
    """Scrape scalar add_argument defaults from the reference option files
    and compare to our dataclass defaults (list/np defaults are checked
    by hand: ds_names/ds_composition/time_to_run match)."""
    import dataclasses
    from tuch_tpu import config as cfg

    def scrape(fname):
        with open(os.path.join(REF_CFG, fname)) as f:
            src = f.read()
        out = {}
        for flag, d in re.findall(
                r"add_argument\('(--[a-z_0-9]+)'[^)]*?default=([^,)]+)",
                src):
            name = flag[2:]
            if name.startswith('no_'):
                continue
            try:
                out[name] = eval(d, {'__builtins__': {}})
            except Exception:
                pass  # lists/np exprs truncated by the regex
        return out

    for fname, cls in (('train_options.py', cfg.TrainConfig),
                       ('smplify_dc_options.py', cfg.SMPLifyDemoConfig),
                       ('eft_fitting_options.py', cfg.EFTConfig)):
        ours = {f.name: f.default for f in dataclasses.fields(cls)
                if f.default is not dataclasses.MISSING}
        diffs = {k: (v, ours[k]) for k, v in scrape(fname).items()
                 if k in ours and ours[k] != v}
        assert not diffs, f'{fname} default mismatches: {diffs}'


def test_fast_profile_expansion(tmp_path):
    """--fast_profile fills the measured-equivalent knob set, but any
    explicitly-set knob wins (docs/ab_fast_knobs_r03.json is the label)."""
    from tuch_tpu import config as cfgmod

    cfg = cfgmod.parse_config(cfgmod.TrainConfig, [
        '--fast_profile', '--batch_size', '64', '--name', 'fp',
        '--log_dir', str(tmp_path)])
    assert cfg.smplify_exterior_refresh == 4
    assert cfg.contact_candidate_k == 984
    assert cfg.smplify_contact_capacity == 40  # 5/8 of 64
    assert cfg.regressor_contact_capacity == 40

    cfg2 = cfgmod.parse_config(cfgmod.TrainConfig, [
        '--fast_profile', '--batch_size', '64',
        '--contact_candidate_k', '512', '--name', 'fp2',
        '--log_dir', str(tmp_path)])
    assert cfg2.contact_candidate_k == 512      # explicit wins
    assert cfg2.smplify_exterior_refresh == 4   # default filled

    # off by default: exact reference semantics untouched
    cfg3 = cfgmod.parse_config(cfgmod.TrainConfig, [
        '--batch_size', '64', '--name', 'fp3', '--log_dir', str(tmp_path)])
    assert cfg3.smplify_exterior_refresh == 1
    assert cfg3.contact_candidate_k == 0
    assert cfg3.smplify_contact_capacity == 0
    assert cfg3.regressor_contact_capacity == 0


def test_fast_profile_explicit_exact_value_wins(tmp_path):
    """--fast_profile with an explicitly-passed EXACT-semantics value must
    keep that value (code-review r03 finding: default-comparison silently
    overrode e.g. --contact_candidate_k 0)."""
    from tuch_tpu import config as cfgmod

    cfg = cfgmod.parse_config(cfgmod.TrainConfig, [
        '--fast_profile', '--batch_size', '64',
        '--contact_candidate_k', '0',
        '--smplify_exterior_refresh', '1',
        '--name', 'fpe', '--log_dir', str(tmp_path)])
    assert cfg.contact_candidate_k == 0          # explicit exact kept
    assert cfg.smplify_exterior_refresh == 1     # explicit exact kept
    assert cfg.smplify_contact_capacity == 40    # untouched -> filled
    assert cfg.regressor_contact_capacity == 40
