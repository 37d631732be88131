"""Recording stub of the gradio API surface used by vad_tpu/ui/app.py.

gradio is not installed in this image, so the widget layer could never
execute under test.  This stub implements exactly the constructors and
context managers app.py touches (Blocks/Tabs/Tab/Row/Column, Markdown,
Dropdown, Button.click, Textbox, Image, Video, Slider, launch) while
recording every component and click wiring, letting tests drive each
callback closure with canned inputs and catch signature drift between
app.py and logic.py.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict, List, Optional


class Recorder:
    def __init__(self) -> None:
        self.components: List[Any] = []
        self.tabs: List[str] = []
        self.clicks: List[Dict] = []
        self.launched: Optional[Dict] = None

    def click_for(self, button_text: str) -> Dict:
        for c in self.clicks:
            if c["button"].label == button_text:
                return c
        raise KeyError(
            f"no click wired for button {button_text!r}; "
            f"have {[c['button'].label for c in self.clicks]}"
        )

    def clicks_for(self, button_text: str) -> List[Dict]:
        return [c for c in self.clicks if c["button"].label == button_text]


def make_gradio_module(rec: Recorder) -> types.ModuleType:
    class Component:
        def __init__(self, *args, **kwargs):
            self.args = args
            self.kwargs = kwargs
            self.label = kwargs.get("label", args[0] if args else None)
            self.value = kwargs.get("value")
            self.choices = kwargs.get("choices")
            rec.components.append(self)

    class _Ctx(Component):
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class Blocks(_Ctx):
        def launch(self, **kwargs):
            rec.launched = kwargs

    class Tabs(_Ctx):
        pass

    class Tab(_Ctx):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            rec.tabs.append(self.label)

    class Row(_Ctx):
        pass

    class Column(_Ctx):
        pass

    class Button(Component):
        def click(self, fn=None, inputs=None, outputs=None):
            rec.clicks.append(
                {"button": self, "fn": fn, "inputs": inputs, "outputs": outputs}
            )

    mod = types.ModuleType("gradio")
    mod.Blocks = Blocks
    mod.Tabs = Tabs
    mod.Tab = Tab
    mod.Row = Row
    mod.Column = Column
    mod.Button = Button
    for name in ("Markdown", "Dropdown", "Textbox", "Image", "Video", "Slider"):
        setattr(mod, name, type(name, (Component,), {}))
    return mod


def install(monkeypatch) -> Recorder:
    """Register the stub as ``gradio`` for the duration of a test."""
    rec = Recorder()
    monkeypatch.setitem(sys.modules, "gradio", make_gradio_module(rec))
    return rec
