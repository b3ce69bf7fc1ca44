"""The committed state diagram must match the code's state machine.

The reference keeps a pipeline.cpp.dot diagram validated in CI; here the
diagram (docs/pipeline_states.dot) is generated from
PipelineState.ORDER / REPEATABLE and this test keeps it in sync — and
cross-checks REPEATABLE against the handlers' actual source so the
declared self-loops can't drift from the implementation.
"""

import inspect
import os

from opencalibration_tpu.pipeline.pipeline import Pipeline, PipelineState

_DOT = os.path.join(
    os.path.dirname(__file__), "..", "docs", "pipeline_states.dot"
)


def _handler_name(state: str) -> str:
    return "_run_" + state.lower()


def test_committed_diagram_matches_generated():
    with open(_DOT) as f:
        committed = f.read()
    assert committed == PipelineState.transition_dot(), (
        "docs/pipeline_states.dot is stale — regenerate with "
        "PipelineState.transition_dot()"
    )


def test_every_state_has_a_handler():
    for state in PipelineState.ORDER:
        assert hasattr(Pipeline, _handler_name(state)), state


def test_repeatable_matches_handler_source():
    """A state is declared REPEATABLE iff its handler can return
    'REPEAT' (source-level check; handlers are small and linear)."""
    for state in PipelineState.ORDER:
        src = inspect.getsource(getattr(Pipeline, _handler_name(state)))
        can_repeat = '"REPEAT"' in src
        assert can_repeat == (state in PipelineState.REPEATABLE), state
