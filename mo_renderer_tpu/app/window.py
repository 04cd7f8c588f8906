"""Interactive window shell (optional; headless remains the default).

The reference is an interactive winit app: window creation and modes
(mo_vk/src/window.rs:40-156, :288-342) with per-frame ``window_event`` /
``device_event`` dispatch feeding Input (mo_core/src/application/
mod.rs:178-283, input.rs:315-350) and a live WASD + right-mouse-drag
camera (README.md:15-24).  This module is the TPU build's analog: a
pygame (SDL) window that translates OS events into the EXISTING Input
state machine and blits the renderer's frames.  Nothing renderer-side
changes — the window is just another event source and present target;
tests run it under SDL's dummy video driver.

Usage::

    app = build_app()
    from mo_renderer_tpu.app.window import run_windowed
    run_windowed(app)            # blocks until close / Escape
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..scene.input import EInputButton, Input

logger = logging.getLogger("mo_renderer_tpu")


class PygameWindow:
    """A pygame window mapped onto the Input state machine.

    Event translation mirrors the reference's dispatch: keyboard and
    mouse-button window events -> ``Input.press``/``release``
    (input.rs:315-341), relative mouse motion -> ``Input.move_mouse``
    (the ``DeviceEvent::MouseMotion`` raw-delta path, input.rs:343-350),
    wheel -> ``Input.scroll``, dropped files -> ``Input.drop_file``.
    """

    # pygame button number -> reference button identifier
    _MOUSE = {
        1: EInputButton.MOUSE_LEFT,
        2: EInputButton.MOUSE_MIDDLE,
        3: EInputButton.MOUSE_RIGHT,
    }

    def __init__(self, width: int, height: int,
                 title: str = "mo_renderer_tpu", headless: bool = False):
        if headless and "DISPLAY" not in os.environ:
            os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        import pygame

        self._pg = pygame
        pygame.display.init()
        self.surface = pygame.display.set_mode((width, height))
        pygame.display.set_caption(title)
        self.width, self.height = width, height
        self._grabbed = False

    # --- event pump ------------------------------------------------------
    def _button_of_key(self, ev) -> str | None:
        name = self._pg.key.name(ev.key)
        if len(name) == 1 and name.isalnum():
            return EInputButton.key(name)
        return {"space": "KeySpace", "left shift": "KeyLShift",
                "left ctrl": "KeyLCtrl"}.get(name)

    def pump(self, input_res: Input) -> bool:
        """Translate pending OS events into input_res.

        Returns False when the user closed the window or hit Escape
        (the reference's ``WindowEvent::CloseRequested`` handling,
        mod.rs:191-196)."""
        pg = self._pg
        for ev in pg.event.get():
            if ev.type == pg.QUIT:
                return False
            elif ev.type == pg.KEYDOWN:
                if ev.key == pg.K_ESCAPE:
                    return False
                b = self._button_of_key(ev)
                if b is not None:
                    input_res.press(b)
            elif ev.type == pg.KEYUP:
                b = self._button_of_key(ev)
                if b is not None:
                    input_res.release(b)
            elif ev.type == pg.MOUSEBUTTONDOWN and ev.button in self._MOUSE:
                input_res.press(self._MOUSE[ev.button])
                if ev.button == 3:
                    self._set_grab(True)  # fly mode: capture the cursor
            elif ev.type == pg.MOUSEBUTTONUP and ev.button in self._MOUSE:
                input_res.release(self._MOUSE[ev.button])
                if ev.button == 3:
                    self._set_grab(False)
            elif ev.type == pg.MOUSEMOTION:
                input_res.move_mouse(float(ev.rel[0]), float(ev.rel[1]))
            elif ev.type == pg.MOUSEWHEEL:
                input_res.scroll(float(ev.y))
            elif ev.type == pg.DROPFILE:
                input_res.drop_file(ev.file)
        return True

    def _set_grab(self, grab: bool) -> None:
        """Cursor capture while flying (window.rs:288-342's cursor modes)."""
        try:
            self._pg.event.set_grab(grab)
            self._pg.mouse.set_visible(not grab)
            self._grabbed = grab
        except self._pg.error:  # dummy driver has no cursor
            pass

    # --- present ---------------------------------------------------------
    def present(self, frame: np.ndarray) -> None:
        """Blit an (H, W, 4) uint8 rgba frame and flip."""
        pg = self._pg
        # surfarray wants (W, H, 3)
        rgb = np.transpose(frame[..., :3], (1, 0, 2))
        pg.surfarray.blit_array(self.surface, rgb)
        pg.display.flip()

    def set_title(self, title: str) -> None:
        self._pg.display.set_caption(title)

    def close(self) -> None:
        self._pg.display.quit()


def run_windowed(app, window: PygameWindow | None = None,
                 max_frames: int | None = None,
                 headless: bool = False) -> int:
    """The interactive frame loop (mod.rs:178-283): pump OS events into
    Input, run the runtime systems (Timer + update_camera consume Input),
    render, present, repeat until close/Escape.  Returns frames shown."""
    from ..scene.timer import Timer

    app.resumed()
    input_res = app.world.get_resource(Input)
    if input_res is None:
        input_res = Input()
        app.world.insert_resource(input_res)
    own_window = window is None
    if own_window:
        window = PygameWindow(
            app.config.width, app.config.height, headless=headless
        )
    frames = 0
    try:
        while max_frames is None or frames < max_frames:
            if not window.pump(input_res):
                break
            frame = app.render_frame()
            window.present(frame)
            # raw deltas are a per-frame accumulation (input.rs:343-350)
            input_res.clear_mouse_delta()
            input_res.scroll_delta = 0.0
            frames += 1
            if frames % 30 == 0:
                timer = app.world.get_resource(Timer)
                if timer is not None and timer.fps() > 0:
                    window.set_title(
                        f"mo_renderer_tpu — {timer.fps():.1f} fps"
                    )
    finally:
        if own_window:
            window.close()
    logger.info("window loop ended after %d frames", frames)
    return frames
