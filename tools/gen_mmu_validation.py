"""Generate task-typed MMU validation fixtures (offline, deterministic).

The reference ships 8 real task-typed images + per-image VQA prompts
(/root/reference/mmu_validation/: clevr.jpg counting scene, geo.jpg labeled
geometry, docvqa.png document page, ai2d.png labeled diagram, dog.png photo,
sofa_under_water.jpg surreal scene, llava1/2.jpg natural photos, plus
prompts.jsonl and prompts_with_vqa.json). Real photos cannot ship from this
zero-egress environment, so this script draws deterministic analogs for
every task type with PIL — enough structure that a caption-path regression
(wrong image wiring, wrong VQ offset, collapsed answers) is visible in the
answers — and writes the matching prompt files:

  * counting_scene.png   — clevr analog: N colored shapes to count
  * geometry.png         — labeled parallelogram with angle annotations
  * document.png         — docvqa analog: titled page, header rectangle
  * diagram.png          — ai2d analog: labeled boxes + arrows (water cycle)
  * bar_chart.png        — chart reading task
  * animal_scene.png     — stylized photo analog (sky/grass/animal shape)
  * surreal_scene.png    — sofa-under-water analog (unusual composition)
  * texture_photo_1.png  — llava analog: textured natural-ish scene
  * texture_photo_2.png  — llava analog
  * red_circle.png, gradient_sky.png — round-1 basics (kept)

Run: python tools/gen_mmu_validation.py  (rewrites mmu_validation/)
"""

import json
import os

import numpy as np
from PIL import Image, ImageDraw

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "mmu_validation")
SIZE = 256


def _canvas(color=(255, 255, 255)):
    img = Image.new("RGB", (SIZE, SIZE), color)
    return img, ImageDraw.Draw(img)


def counting_scene():
    """4 objects: 2 red circles, 1 blue square, 1 green triangle."""
    img, d = _canvas((235, 235, 235))
    d.ellipse([30, 40, 80, 90], fill=(200, 30, 30))
    d.ellipse([150, 160, 210, 220], fill=(200, 30, 30))
    d.rectangle([160, 40, 220, 100], fill=(30, 60, 200))
    d.polygon([(60, 200), (100, 140), (140, 200)], fill=(30, 160, 60))
    return img


def geometry():
    img, d = _canvas()
    pts = [(50, 180), (120, 70), (230, 70), (160, 180)]
    d.polygon(pts, outline=(0, 0, 0))
    d.line(pts + [pts[0]], fill=(0, 0, 0), width=2)
    d.line([pts[0], pts[2]], fill=(120, 120, 120), width=1)  # diagonal AC
    for label, (x, y) in zip("ABCD", [(40, 185), (110, 52), (232, 52), (162, 185)]):
        d.text((x, y), label, fill=(0, 0, 0))
    d.text((70, 150), "135", fill=(200, 0, 0))
    d.text((130, 90), "23", fill=(0, 0, 200))
    return img


def document():
    img, d = _canvas()
    d.rectangle([20, 15, 236, 45], outline=(0, 0, 0), width=2)
    d.text((30, 25), "QUARTERLY REPORT", fill=(0, 0, 0))
    y = 60
    for line in ("Revenue: 120", "Costs: 80", "Profit: 40", "Staff: 12"):
        d.text((30, y), line, fill=(40, 40, 40))
        y += 18
    d.rectangle([20, 150, 236, 240], outline=(0, 0, 0))
    d.text((30, 160), "Notes:", fill=(0, 0, 0))
    d.text((30, 180), "All figures in millions.", fill=(80, 80, 80))
    return img


def diagram():
    img, d = _canvas()
    boxes = [("OCEAN", 20, 180), ("CLOUD", 90, 30), ("RAIN", 180, 100)]
    for label, x, y in boxes:
        d.rectangle([x, y, x + 60, y + 30], outline=(0, 0, 0), width=2)
        d.text((x + 6, y + 9), label, fill=(0, 0, 0))
    d.line([(50, 180), (110, 62)], fill=(0, 0, 200), width=2)   # evaporation
    d.line([(150, 48), (200, 98)], fill=(0, 0, 200), width=2)   # condensation
    d.line([(200, 132), (90, 185)], fill=(0, 0, 200), width=2)  # back to ocean
    d.text((30, 110), "evaporate", fill=(0, 0, 200))
    return img


def bar_chart():
    img, d = _canvas()
    vals = [("A", 40), ("B", 90), ("C", 60)]
    d.line([(30, 220), (230, 220)], fill=(0, 0, 0), width=2)
    d.line([(30, 220), (30, 40)], fill=(0, 0, 0), width=2)
    for i, (name, v) in enumerate(vals):
        x = 55 + i * 60
        d.rectangle([x, 220 - 2 * v, x + 36, 220], fill=(70, 100, 200))
        d.text((x + 14, 228), name, fill=(0, 0, 0))
    return img


def animal_scene():
    img, d = _canvas((140, 190, 240))           # sky
    d.rectangle([0, 170, SIZE, SIZE], fill=(70, 160, 70))  # grass
    d.ellipse([200, 20, 245, 65], fill=(250, 220, 80))     # sun
    # stylized four-legged animal silhouette
    d.ellipse([80, 140, 170, 185], fill=(120, 80, 50))     # body
    d.ellipse([155, 115, 190, 150], fill=(120, 80, 50))    # head
    for x in (90, 110, 135, 155):
        d.rectangle([x, 180, x + 8, 210], fill=(120, 80, 50))
    return img


def surreal_scene():
    img, d = _canvas((30, 80, 160))              # deep water
    for y in range(0, SIZE, 24):                  # light rays / waves
        d.arc([0, y - 12, SIZE, y + 12], 180, 360, fill=(90, 150, 220))
    # a sofa, underwater
    d.rectangle([70, 150, 190, 195], fill=(170, 60, 60))
    d.rectangle([70, 120, 90, 195], fill=(150, 50, 50))
    d.rectangle([170, 120, 190, 195], fill=(150, 50, 50))
    d.ellipse([110, 60, 130, 80], outline=(220, 230, 250))  # bubbles
    d.ellipse([140, 40, 152, 52], outline=(220, 230, 250))
    return img


def texture_photo(seed):
    rng = np.random.default_rng(seed)
    base = rng.normal(0.5, 0.12, (SIZE // 8, SIZE // 8, 3)).clip(0, 1)
    arr = np.kron(base, np.ones((8, 8, 1)))
    arr[: SIZE // 2] = arr[: SIZE // 2] * 0.6 + np.array([0.3, 0.5, 0.8]) * 0.4
    arr[SIZE // 2:] = arr[SIZE // 2:] * 0.6 + np.array([0.35, 0.55, 0.25]) * 0.4
    return Image.fromarray((arr * 255).astype(np.uint8))


def red_circle():
    img, d = _canvas((255, 255, 255))
    d.ellipse([64, 64, 192, 192], fill=(220, 30, 30))
    return img


def gradient_sky():
    y = np.linspace(0, 1, SIZE)[:, None, None]
    arr = (1 - y) * np.array([60, 90, 200]) + y * np.array([250, 200, 120])
    return Image.fromarray(np.tile(arr, (1, SIZE, 1)).astype(np.uint8))


FIXTURES = {
    "counting_scene.png": (
        counting_scene, "How many objects are there in total in this picture?"
    ),
    "geometry.png": (
        geometry,
        "In the parallelogram ABCD shown, what are the labeled angle values?",
    ),
    "document.png": (
        document, "What is written in the rectangle at the top of the page?"
    ),
    "diagram.png": (
        diagram, "What process does the arrow from the ocean to the cloud show?"
    ),
    "bar_chart.png": (bar_chart, "Which bar is the tallest in this chart?"),
    "animal_scene.png": (animal_scene, "What animal is in this picture?"),
    "surreal_scene.png": (
        surreal_scene, "What is unusual about this picture?"
    ),
    "texture_photo_1.png": (
        lambda: texture_photo(5), "Please describe this image in detail."
    ),
    "texture_photo_2.png": (
        lambda: texture_photo(11), "What is the main subject of this image?"
    ),
    "red_circle.png": (red_circle, "What shape and color do you see?"),
    "gradient_sky.png": (gradient_sky, "Describe the colors in this image."),
}

THINK_PREFIX = (
    "You should first think about the reasoning process in the mind and "
    "then provide the user with the answer. The reasoning process is "
    "enclosed within <think> </think> tags, i.e. <think> reasoning process "
    "here </think> answer here\n"
)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, (fn, _q) in FIXTURES.items():
        fn().save(os.path.join(OUT, name))
    with open(os.path.join(OUT, "prompts.jsonl"), "w") as f:
        for name, (_fn, q) in FIXTURES.items():
            f.write(json.dumps({"file_name": name, "prompt": q}) + "\n")
    vqa = [
        {
            "file_name": name,
            "messages": [{"role": "user", "content": THINK_PREFIX + q}],
        }
        for name, (_fn, q) in FIXTURES.items()
    ]
    with open(os.path.join(OUT, "prompts_with_vqa.json"), "w") as f:
        json.dump(vqa, f, indent=2)
    print(f"wrote {len(FIXTURES)} images + prompts to {OUT}")


if __name__ == "__main__":
    main()
