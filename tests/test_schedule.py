"""ReduceLROnPlateau unit tests (torch semantics: fire after patience+1
consecutive non-improving epochs, relative threshold, state_dict restore)."""

from jpdse_tpu.train.schedule import ReduceLROnPlateau


def test_fires_after_patience_bad_epochs():
    s = ReduceLROnPlateau(lr=1e-3, factor=0.1, patience=2)
    assert s.step(10.0) == 1e-3  # new best
    assert s.step(11.0) == 1e-3  # bad 1
    assert s.step(11.0) == 1e-3  # bad 2
    assert abs(s.step(11.0) - 1e-4) < 1e-12  # bad 3 > patience -> fire
    assert s.num_bad_epochs == 0


def test_improvement_resets_counter():
    s = ReduceLROnPlateau(lr=1e-3, factor=0.1, patience=1)
    s.step(10.0)
    s.step(11.0)  # bad 1
    s.step(9.0)   # improvement resets
    s.step(9.5)   # bad 1
    assert s.lr == 1e-3
    s.step(9.5)   # bad 2 -> fire
    assert abs(s.lr - 1e-4) < 1e-12


def test_threshold_is_relative():
    s = ReduceLROnPlateau(lr=1e-3, factor=0.5, patience=0)
    s.step(100.0)
    # within the 1e-4 relative band: NOT an improvement
    assert s.step(99.999) == 5e-4


def test_state_dict_round_trip():
    s = ReduceLROnPlateau(lr=1e-3, factor=0.1, patience=3)
    s.step(5.0)
    s.step(6.0)
    d = s.state_dict()
    s2 = ReduceLROnPlateau(lr=1.0)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == 5.0 and s2.num_bad_epochs == 1
    # torch-faithful: hyperparameters (patience/factor) restore too
    assert s2.patience == 3
