/* Headless SDL3/SDL3_image stub implementation — see SDL3/SDL.h here
 * for scope and rationale. */
#include <SDL3/SDL.h>
#include <SDL3/SDL_image.h>
#include <stdlib.h>
#include <string.h>

int SDL_Init(uint32_t flags) { (void)flags; return 0; }
void SDL_LogSetPriority(int c, int p) { (void)c; (void)p; }

uint32_t SDL_GetPixelFormatEnumForMasks(int bpp, uint32_t r, uint32_t g,
                                        uint32_t b, uint32_t a) {
    (void)bpp; (void)r; (void)g; (void)b; (void)a;
    return 1; /* any nonzero token */
}

SDL_Surface *SDL_CreateSurface(int width, int height, uint32_t format) {
    SDL_Surface *s = (SDL_Surface *)calloc(1, sizeof(SDL_Surface));
    if (!s) return NULL;
    s->format = format;
    s->w = width;
    s->h = height;
    s->pitch = width * 4;
    s->pixels = calloc((size_t)width * height, 4);
    if (!s->pixels) { free(s); return NULL; }
    return s;
}

void SDL_DestroySurface(SDL_Surface *s) {
    if (s) { free(s->pixels); free(s); }
}

int SDL_LockSurface(SDL_Surface *s) { (void)s; return 0; }
void SDL_UnlockSurface(SDL_Surface *s) { (void)s; }

SDL_Renderer *SDL_CreateSoftwareRenderer(SDL_Surface *target) {
    /* the renderer token is just its target surface */
    return (SDL_Renderer *)target;
}
void SDL_DestroyRenderer(SDL_Renderer *r) { (void)r; }
int SDL_SetRenderDrawColor(SDL_Renderer *r, uint8_t rr, uint8_t g,
                           uint8_t b, uint8_t a) {
    (void)r; (void)rr; (void)g; (void)b; (void)a; return 0;
}
int SDL_RenderClear(SDL_Renderer *r) { (void)r; return 0; }

SDL_Texture *SDL_CreateTextureFromSurface(SDL_Renderer *r, SDL_Surface *s) {
    (void)r; (void)s;
    return (SDL_Texture *)malloc(1); /* opaque non-null token */
}
void SDL_DestroyTexture(SDL_Texture *t) { free(t); }
int SDL_SetTextureAlphaMod(SDL_Texture *t, uint8_t a) {
    (void)t; (void)a; return 0;
}
int SDL_RenderTextureRotated(SDL_Renderer *r, SDL_Texture *t,
                             const SDL_FRect *src, const SDL_FRect *dst,
                             double angle, const SDL_FPoint *center,
                             SDL_FlipMode flip) {
    (void)r; (void)t; (void)src; (void)dst; (void)angle; (void)center;
    (void)flip;
    return 0; /* draws nothing: game logic never reads pixels */
}

int IMG_Init(int flags) { (void)flags; return flags; }

SDL_Surface *IMG_Load(const char *file) {
    (void)file; /* never opened: content is render-only */
    return SDL_CreateSurface(32, 32, 1);
}
