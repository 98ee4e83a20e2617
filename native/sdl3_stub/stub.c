/* Headless SDL3/SDL3_image stub implementation — see SDL3/SDL.h here
 * for scope and rationale.
 *
 * Since round 4b the stub RENDERS: IMG_Load decodes the real PNGs via
 * libpng (resolving relative asset paths against $SDL_STUB_ASSET_ROOT,
 * normally /root/reference), and SDL_RenderTextureRotated rasterizes
 * nearest-sampled, alpha-blended (optionally flipped/rotated) blits
 * into the target surface. This makes the reference's own render loop
 * produce REAL observation pixels through the CEnv ABI. The
 * rasterization approximates SDL3's software renderer (floor-snapped
 * dst rects, nearest sampling, src-over blending); cross-engine pixel
 * comparisons treat it as a budgeted approximation, not bit-exact —
 * rewards/termination remain exact regardless.
 */
#include <SDL3/SDL.h>
#include <SDL3/SDL_image.h>
#include <math.h>
#include <png.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---- surfaces -------------------------------------------------------- */

SDL_Surface *SDL_CreateSurface(int width, int height, uint32_t format) {
    SDL_Surface *s = (SDL_Surface *)calloc(1, sizeof(SDL_Surface));
    if (!s) return NULL;
    s->format = format;
    s->w = width;
    s->h = height;
    s->pitch = width * 4;
    s->pixels = calloc((size_t)width * height, 4); /* RGBA bytes */
    if (!s->pixels) { free(s); return NULL; }
    return s;
}

void SDL_DestroySurface(SDL_Surface *s) {
    if (s) { free(s->pixels); free(s); }
}

int SDL_LockSurface(SDL_Surface *s) { (void)s; return 0; }
void SDL_UnlockSurface(SDL_Surface *s) { (void)s; }

int SDL_Init(uint32_t flags) { (void)flags; return 0; }
void SDL_LogSetPriority(int c, int p) { (void)c; (void)p; }

uint32_t SDL_GetPixelFormatEnumForMasks(int bpp, uint32_t r, uint32_t g,
                                        uint32_t b, uint32_t a) {
    (void)bpp; (void)r; (void)g; (void)b; (void)a;
    return 1;
}

/* ---- renderer / textures -------------------------------------------- */

struct SDL_Renderer_real {
    SDL_Surface *target;
    uint8_t draw_r, draw_g, draw_b, draw_a;
};

struct SDL_Texture_real {
    int w, h;
    uint8_t *pixels;   /* RGBA */
    uint8_t alpha_mod;
};

SDL_Renderer *SDL_CreateSoftwareRenderer(SDL_Surface *target) {
    struct SDL_Renderer_real *r =
        (struct SDL_Renderer_real *)calloc(1, sizeof(*r));
    r->target = target;
    r->draw_a = 255;
    return (SDL_Renderer *)r;
}
void SDL_DestroyRenderer(SDL_Renderer *rp) { free(rp); }

int SDL_SetRenderDrawColor(SDL_Renderer *rp, uint8_t r, uint8_t g,
                           uint8_t b, uint8_t a) {
    struct SDL_Renderer_real *rr = (struct SDL_Renderer_real *)rp;
    rr->draw_r = r; rr->draw_g = g; rr->draw_b = b; rr->draw_a = a;
    return 0;
}

int SDL_RenderClear(SDL_Renderer *rp) {
    struct SDL_Renderer_real *rr = (struct SDL_Renderer_real *)rp;
    SDL_Surface *t = rr->target;
    uint8_t *px = (uint8_t *)t->pixels;
    for (long i = 0; i < (long)t->w * t->h; i++) {
        px[4 * i + 0] = rr->draw_r;
        px[4 * i + 1] = rr->draw_g;
        px[4 * i + 2] = rr->draw_b;
        px[4 * i + 3] = rr->draw_a;
    }
    return 0;
}

SDL_Texture *SDL_CreateTextureFromSurface(SDL_Renderer *rp, SDL_Surface *s) {
    (void)rp;
    struct SDL_Texture_real *t =
        (struct SDL_Texture_real *)calloc(1, sizeof(*t));
    t->w = s->w;
    t->h = s->h;
    t->alpha_mod = 255;
    t->pixels = (uint8_t *)malloc((size_t)s->w * s->h * 4);
    memcpy(t->pixels, s->pixels, (size_t)s->w * s->h * 4);
    return (SDL_Texture *)t;
}

void SDL_DestroyTexture(SDL_Texture *tp) {
    struct SDL_Texture_real *t = (struct SDL_Texture_real *)tp;
    if (t) { free(t->pixels); free(t); }
}

int SDL_SetTextureAlphaMod(SDL_Texture *tp, uint8_t a) {
    ((struct SDL_Texture_real *)tp)->alpha_mod = a;
    return 0;
}

/* Nearest-sampled src-over blit of the texture's src rect onto the
 * target's dst rect, with optional flips and rotation about the dst
 * center (angle in degrees, screen-clockwise like SDL). */
int SDL_RenderTextureRotated(SDL_Renderer *rp, SDL_Texture *tp,
                             const SDL_FRect *srcrect,
                             const SDL_FRect *dstrect,
                             double angle, const SDL_FPoint *center,
                             SDL_FlipMode flip) {
    struct SDL_Renderer_real *rr = (struct SDL_Renderer_real *)rp;
    struct SDL_Texture_real *t = (struct SDL_Texture_real *)tp;
    SDL_Surface *tg = rr->target;
    (void)center; /* reference always passes NULL (dst center) */

    SDL_FRect src = srcrect ? *srcrect
                            : (SDL_FRect){0, 0, (float)t->w, (float)t->h};
    if (!dstrect || src.w <= 0 || src.h <= 0 || dstrect->w <= 0 ||
        dstrect->h <= 0)
        return 0;
    SDL_FRect dst = *dstrect;

    double rad = angle * M_PI / 180.0;
    double cr = cos(rad), sr = sin(rad);
    double cx = dst.x + dst.w * 0.5, cy = dst.y + dst.h * 0.5;

    /* bounding box of the (possibly rotated) dst rect */
    double half = 0.5 * sqrt((double)dst.w * dst.w + (double)dst.h * dst.h);
    int y0 = (int)floor(angle != 0.0 ? cy - half : dst.y);
    int y1 = (int)ceil(angle != 0.0 ? cy + half : dst.y + dst.h);
    int x0 = (int)floor(angle != 0.0 ? cx - half : dst.x);
    int x1 = (int)ceil(angle != 0.0 ? cx + half : dst.x + dst.w);
    if (y0 < 0) y0 = 0;
    if (x0 < 0) x0 = 0;
    if (y1 > tg->h) y1 = tg->h;
    if (x1 > tg->w) x1 = tg->w;

    uint8_t *out = (uint8_t *)tg->pixels;
    for (int py = y0; py < y1; py++) {
        for (int px = x0; px < x1; px++) {
            /* inverse-map the dst pixel center into dst-rect space */
            double dx = px + 0.5 - cx, dy = py + 0.5 - cy;
            double lx, ly;
            if (angle != 0.0) {
                lx = cr * dx + sr * dy + dst.w * 0.5;
                ly = -sr * dx + cr * dy + dst.h * 0.5;
            } else {
                lx = px + 0.5 - dst.x;
                ly = py + 0.5 - dst.y;
            }
            if (lx < 0 || lx >= dst.w || ly < 0 || ly >= dst.h) continue;
            double u = src.x + lx * (src.w / dst.w);
            double v = src.y + ly * (src.h / dst.h);
            if (flip & SDL_FLIP_HORIZONTAL) u = src.x + (src.x + src.w - u);
            if (flip & SDL_FLIP_VERTICAL) v = src.y + (src.y + src.h - v);
            int iu = (int)u, iv = (int)v;
            if (iu < 0 || iu >= t->w || iv < 0 || iv >= t->h) continue;
            const uint8_t *sp = t->pixels + 4 * ((long)iv * t->w + iu);
            unsigned a = (unsigned)sp[3] * t->alpha_mod / 255u;
            if (a == 0) continue;
            uint8_t *dp = out + 4 * ((long)py * tg->w + px);
            dp[0] = (uint8_t)((sp[0] * a + dp[0] * (255u - a)) / 255u);
            dp[1] = (uint8_t)((sp[1] * a + dp[1] * (255u - a)) / 255u);
            dp[2] = (uint8_t)((sp[2] * a + dp[2] * (255u - a)) / 255u);
            dp[3] = 255;
        }
    }
    return 0;
}

/* ---- SDL_image: real PNG decoding via libpng ------------------------ */

int IMG_Init(int flags) { (void)flags; return flags; }

static FILE *open_asset(const char *file) {
    FILE *f = fopen(file, "rb");
    if (f) return f;
    const char *root = getenv("SDL_STUB_ASSET_ROOT");
    if (!root) root = "/root/reference";
    char path[1024];
    snprintf(path, sizeof(path), "%s/%s", root, file);
    return fopen(path, "rb");
}

SDL_Surface *IMG_Load(const char *file) {
    FILE *f = open_asset(file);
    if (!f) return NULL;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        if (png) png_destroy_read_struct(&png, &info, NULL);
        fclose(f);
        return NULL;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    /* normalize anything to 8-bit RGBA */
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_GRAY ||
        color == PNG_COLOR_TYPE_PALETTE)
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    SDL_Surface *s = SDL_CreateSurface((int)w, (int)h, 1);
    png_bytep *rows = (png_bytep *)malloc(h * sizeof(png_bytep));
    for (png_uint_32 y = 0; y < h; y++)
        rows[y] = (png_bytep)s->pixels + (size_t)y * w * 4;
    png_read_image(png, rows);
    free(rows);
    png_destroy_read_struct(&png, &info, NULL);
    fclose(f);
    return s;
}
