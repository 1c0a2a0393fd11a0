"""Recording-fake ``gradio`` module (test-scoped).

gradio is not installable offline, so ``fresco_tpu.webui.launch()`` —
the actual ``gr.Blocks`` construction, example wiring, and click
handlers (reference webUI.py:418-637) — would otherwise never execute.
This stub implements just enough of the gradio surface as recording
fakes to run ``launch()`` end-to-end: every control records its label /
value / kwargs and registers itself on the enclosing Blocks; ``click``
records (fn, inputs, outputs) so tests can invoke the real handlers.

Usage (see test_webui.py):

    sys.modules["gradio"] = gradio_stub
    app = fresco_tpu.webui.launch(tiny=True)      # a stub Blocks
    label, fn, inputs, outputs = app.buttons[0]   # run fn(*values)
"""
from __future__ import annotations


class _Ctx:
    """Context-manager base: gradio layout elements are used as
    ``with gr.X(...):`` blocks."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Blocks(_Ctx):
    #: the most recently constructed Blocks — components register here
    current: "Blocks | None" = None

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.components: list[Component] = []
        #: [(button_label, fn, inputs, outputs), ...] from Button.click
        self.buttons: list[tuple] = []
        #: [(examples, inputs), ...] from gr.Examples
        self.examples: list[tuple] = []
        self.markdown: list[str] = []
        self.launched: dict | None = None
        Blocks.current = self

    def launch(self, **kwargs):
        self.launched = kwargs
        return self


class Row(_Ctx):
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class Column(_Ctx):
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class Accordion(_Ctx):
    def __init__(self, label=None, open=True, **kwargs):
        self.label = label
        self.open = open
        self.kwargs = kwargs


class Component:
    """Base recording control: stores label/value/other kwargs and
    appends itself to the active Blocks' component list."""

    def __init__(self, *args, label=None, value=None, **kwargs):
        self.args = args
        self.label = label
        self.value = value
        self.kwargs = kwargs
        if Blocks.current is not None:
            Blocks.current.components.append(self)


class Textbox(Component):
    pass


class Number(Component):
    pass


class Checkbox(Component):
    pass


class Video(Component):
    pass


class Image(Component):
    pass


class Dropdown(Component):
    def __init__(self, *args, choices=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.choices = choices


class Radio(Component):
    def __init__(self, choices=None, **kwargs):
        super().__init__(**kwargs)
        self.choices = choices


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, **kwargs):
        super().__init__(**kwargs)
        self.minimum = minimum
        self.maximum = maximum


class Button(Component):
    def __init__(self, label=None, **kwargs):
        super().__init__(label=label, **kwargs)

    def click(self, fn, inputs=None, outputs=None):
        Blocks.current.buttons.append((self.label, fn, inputs, outputs))


def Markdown(text="", **kwargs):
    if Blocks.current is not None:
        Blocks.current.markdown.append(text)


class Examples:
    def __init__(self, examples=None, inputs=None, **kwargs):
        self.examples = examples
        self.inputs = inputs
        if Blocks.current is not None:
            Blocks.current.examples.append((examples, inputs))


class Error(Exception):
    """gr.Error analog (reference webUI.py:242)."""
