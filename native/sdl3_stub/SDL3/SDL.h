/* Minimal SDL3 API surface for compiling the reference games HEADLESS.
 *
 * The real SDL3 is not in this image and there is no network egress, so
 * this stub supplies just the ~17 symbols the reference's game code
 * touches (inventoried over games/<g>/ + cenv/). Rendering calls are
 * no-ops: surfaces are real zero-filled pixel buffers (the games read
 * them back for observations), textures are opaque tokens, and the
 * software renderer draws nothing. Game LOGIC — generation, physics,
 * rewards, termination — never depends on pixel contents, so a .so
 * built against this stub reproduces the reference's exact reward /
 * termination behavior (the thing the parity suite executes against).
 *
 * This header only needs to agree with stub.c (both are ours); it makes
 * no attempt to match the real SDL3 ABI.
 */
#ifndef SDL3_STUB_SDL_H
#define SDL3_STUB_SDL_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SDL_LIL_ENDIAN 1234
#define SDL_BIG_ENDIAN 4321
#define SDL_BYTEORDER SDL_LIL_ENDIAN

#define SDL_INIT_VIDEO 0x20
#define SDL_LOG_CATEGORY_APPLICATION 0
#define SDL_LOG_PRIORITY_INFO 3

typedef enum SDL_FlipMode {
    SDL_FLIP_NONE = 0,
    SDL_FLIP_HORIZONTAL = 1,
    SDL_FLIP_VERTICAL = 2
} SDL_FlipMode;

typedef struct SDL_Rect { int x, y, w, h; } SDL_Rect;
typedef struct SDL_FRect { float x, y, w, h; } SDL_FRect;
typedef struct SDL_FPoint { float x, y; } SDL_FPoint;

typedef struct SDL_Surface {
    uint32_t format;
    int w, h;
    int pitch;
    void *pixels;
} SDL_Surface;

typedef struct SDL_Renderer SDL_Renderer;   /* opaque */
typedef struct SDL_Texture SDL_Texture;     /* opaque */

int SDL_Init(uint32_t flags);
void SDL_LogSetPriority(int category, int priority);
uint32_t SDL_GetPixelFormatEnumForMasks(int bpp, uint32_t rmask,
                                        uint32_t gmask, uint32_t bmask,
                                        uint32_t amask);
SDL_Surface *SDL_CreateSurface(int width, int height, uint32_t format);
void SDL_DestroySurface(SDL_Surface *surface);
int SDL_LockSurface(SDL_Surface *surface);
void SDL_UnlockSurface(SDL_Surface *surface);
SDL_Renderer *SDL_CreateSoftwareRenderer(SDL_Surface *target);
void SDL_DestroyRenderer(SDL_Renderer *renderer);
int SDL_SetRenderDrawColor(SDL_Renderer *renderer, uint8_t r, uint8_t g,
                           uint8_t b, uint8_t a);
int SDL_RenderClear(SDL_Renderer *renderer);
SDL_Texture *SDL_CreateTextureFromSurface(SDL_Renderer *renderer,
                                          SDL_Surface *surface);
void SDL_DestroyTexture(SDL_Texture *texture);
int SDL_SetTextureAlphaMod(SDL_Texture *texture, uint8_t alpha);
int SDL_RenderTextureRotated(SDL_Renderer *renderer, SDL_Texture *texture,
                             const SDL_FRect *srcrect,
                             const SDL_FRect *dstrect,
                             double angle, const SDL_FPoint *center,
                             SDL_FlipMode flip);

#ifdef __cplusplus
}
#endif
#endif
