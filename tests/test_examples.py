"""Run the instructive examples end-to-end (reference
``robomimic/tests/test_examples.py``)."""

import pytest


def test_simple_config(capsys):
    from examples.simple_config import main

    main()
    out = capsys.readouterr().out
    assert "caught the typo" in out


def test_simple_train_loop(capsys):
    from examples.simple_train_loop import main

    main()
    out = capsys.readouterr().out
    assert "epoch 1" in out
